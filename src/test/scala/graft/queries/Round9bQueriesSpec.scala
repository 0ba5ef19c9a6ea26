package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-9 multiple-testing batch at
  * sf0.001 (exact values ride the DuckDB oracle gate at sf0.01).
  */
class Round9bQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round9bQueries.queries(name)(spark, sf0001)

  test("q_chi2_brand_fdr: p in (0,1], rejections are a rank prefix") {
    val rows = run("q_chi2_brand_fdr").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.0) // chi2
      val p = r.getDouble(3)
      assert(p > 0.0 && p <= 1.0)
    }
    // BH rejects a prefix of the p-ordered ranks: every rejected rank
    // must be below every accepted rank
    val rej = rows.filter(_.getBoolean(5)).map(_.getLong(4))
    val acc = rows.filterNot(_.getBoolean(5)).map(_.getLong(4))
    if (rej.nonEmpty && acc.nonEmpty) assert(rej.max < acc.min)
    // ranks are a permutation of 1..m
    assert(rows.map(_.getLong(4)).sorted.toSeq == (1L to rows.length).toSeq)
  }

  test("q_multiple_testing_compare: bonferroni <= holm <= bh <= m") {
    val r = run("q_multiple_testing_compare").collect()(0)
    val (m, bonf, holm, bh) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(m > 0)
    assert(0 <= bonf && bonf <= holm && holm <= bh && bh <= m,
      s"expected bonf($bonf) <= holm($holm) <= bh($bh) <= m($m)")
  }

  test("counts agree between the fdr table and the comparison row") {
    val bhTable = run("q_chi2_brand_fdr").collect()
      .count(_.getBoolean(5)).toLong
    val r = run("q_multiple_testing_compare").collect()(0)
    assert(r.getLong(3) == bhTable)
    assert(r.getLong(0) == run("q_chi2_brand_fdr").count())
  }

  test("q_storey_pi0: estimator identities") {
    val r = run("q_storey_pi0").collect()(0)
    val (m, gtHalf, sig) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val (pi0, fdp) = (r.getDouble(3), r.getDouble(4))
    assert(gtHalf <= m && sig <= m)
    assert(math.abs(pi0 - 2.0 * gtHalf / m) < 1e-15)
    assert(pi0 >= 0.0) // can exceed 1 by construction on conservative data
    assert(fdp >= 0.0)
    if (sig > 0) assert(math.abs(fdp - pi0 * m * 0.05 / sig) < 1e-12)
  }
}
