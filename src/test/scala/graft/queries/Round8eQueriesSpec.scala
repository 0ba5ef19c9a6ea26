package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-8 sketch/linear-algebra batch at
  * sf0.001 (exact values ride the DuckDB oracle gate at sf0.01).
  */
class Round8eQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round8eQueries.queries(name)(spark, sf0001)

  test("q_sketch_join_size: CMS overestimates, both sketches positive") {
    val r = run("q_sketch_join_size").collect()(0)
    val (exact, cms, ams) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(exact > 0)
    // CMS inner-product is a.s. an overestimate (collisions only add)
    assert(cms >= exact, s"CMS $cms below exact $exact")
    assert(r.getDouble(3) >= 1.0)
    // AMS is unbiased; at depth 4 just require a sane positive figure
    assert(ams > 0.0)
  }

  test("q_jl_distortion: ratios bracket 1, rank picks ordered") {
    val r = run("q_jl_distortion").collect()(0)
    val (n, mn, med, p90, mx) = (r.getLong(0), r.getDouble(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(n == 50L * 49 / 2, s"expected C(50,2) pairs, got $n")
    assert(mn > 0.0 && mn <= med && med <= p90 && p90 <= mx)
    // E[ratio] = 1 under JL; the median should land well inside [1/4, 4]
    assert(med > 0.25 && med < 4.0, s"median ratio $med implausible")
  }

  test("q_pca_power: unit-norm loadings, lambda dominates per-dim mass") {
    val rows = run("q_pca_power").collect()
    assert(rows.length == 5)
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4, 5))
    val lambda = rows.head.getDouble(3)
    assert(lambda > 0.0)
    assert(rows.forall(_.getDouble(3) == lambda), "lambda must be constant")
    val loads = rows.map(_.getDouble(2))
    // |loading| <= 1 (components of a unit vector), ranked descending
    assert(loads.forall(l => math.abs(l) <= 1.0))
    val absL = loads.map(math.abs)
    assert(absL.sliding(2).forall { case Array(a, b) => a >= b },
      "|loading| not descending in rank")
    // 5 components of a unit vector: combined mass <= 1
    assert(absL.map(l => l * l).sum <= 1.0 + 1e-12)
  }
}
