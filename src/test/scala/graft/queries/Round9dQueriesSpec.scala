package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-9 graph-mining batch at sf0.001
  * (exact values ride the DuckDB oracle gate at sf0.01).
  */
class Round9dQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round9dQueries.queries(name)(spark, sf0001)

  test("q_ppr_seeds: positive ranks, sorted desc, at most 20") {
    val rows = run("q_ppr_seeds").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val rs = rows.map(_.getLong(1)).toSeq
    assert(rs.forall(_ > 0))
    assert(rs == rs.sortBy(-_))
  }

  test("q_ppr_seeds: mass reaches non-seed nodes only via edges") {
    // a non-seed node can only appear with propagated (non-restart)
    // mass; a seed node's rank includes the 150M restart after step 2
    val rows = run("q_ppr_seeds").collect()
    rows.foreach { r =>
      val (node, rank) = (r.getLong(0), r.getLong(1))
      if (node % 20 == 0) assert(rank >= 150000000L)
    }
  }

  test("q_ktruss_support: peeling is monotone and support is 3x triangles") {
    val r = run("q_ktruss_support").collect()(0)
    val (e0, sup0, e1, e2) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(e2 <= e1 && e1 <= e0)
    assert(sup0 % 3 == 0, "every triangle contributes exactly 3 supports")
    if (sup0 == 0) assert(e1 == 0 && e2 == 0)
  }

  test("q_link_pred_cn: candidates are non-edges with positive overlap") {
    val rows = run("q_link_pred_cn").collect()
    val edges = Round5gQueries.coEdges(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { r =>
      val (u, w, cn, pa) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(u % 100 == 0, "candidates come from the seed cohort")
      assert(u != w)
      val canon = (math.min(u, w), math.max(u, w))
      assert(!edges.contains(canon), s"($u,$w) is already an edge")
      assert(cn >= 1)
      // cn common neighbors require degree >= cn on both ends
      assert(pa >= cn * cn)
    }
    // ranked by cn desc first
    val cns = rows.map(_.getLong(2)).toSeq
    assert(cns == cns.sortBy(-_))
  }
}
