package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-8 layout/LM/bootstrap batch at
  * sf0.001 (exact values ride the DuckDB oracle gate at sf0.01).
  */
class Round8hQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round8hQueries.queries(name)(spark, sf0001)

  test("q_zonemap_prune_sim: sorted layout prunes at least as much") {
    val r = run("q_zonemap_prune_sim").collect()(0)
    val (nRows, nMatch, nBlocks, skipCur, skipSrt) = (r.getLong(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nRows > 0 && nBlocks == (nRows + 127) / 128)
    assert(nMatch >= 0 && nMatch <= nRows)
    assert(skipCur >= 0 && skipCur <= nBlocks)
    // sorting by the predicate column concentrates non-matching rows
    // into whole blocks — it can never prune fewer
    assert(skipSrt >= skipCur, s"sorted $skipSrt < current $skipCur")
    // every skipped block holds only non-matching rows
    assert(skipSrt * 128 <= (nRows - nMatch) + 127)
  }

  test("q_trigram_lm_nll: rank stats ordered, NLL nonnegative") {
    val rows = run("q_trigram_lm_nll").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (mn, med, p90, mx) = (r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))
      // cnt3 <= cnt2 always, so each term ln(cnt2/cnt3) >= 0
      assert(mn >= 0.0)
      assert(mn <= med && med <= p90 && p90 <= mx)
    }
  }

  test("q_bootstrap_ci: CI brackets the point estimate, width positive") {
    val rows = run("q_bootstrap_ci").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, point, lo, hi, width) = (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(n > 0 && point > 0.0)
      assert(lo <= hi && math.abs(width - (hi - lo)) < 1e-12)
      // a 90% bootstrap CI around the mean should contain the point
      // estimate for any non-pathological sample
      assert(lo <= point && point <= hi,
        s"point $point outside CI [$lo, $hi]")
    }
  }
}
