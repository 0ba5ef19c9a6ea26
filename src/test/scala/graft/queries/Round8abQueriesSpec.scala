package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-8 estimation-quality batch at
  * sf0.001 (exact values ride the DuckDB oracle gate at sf0.01).
  */
class Round8abQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round8abQueries.queries(name)(spark, sf0001)

  test("q_selectivity_independence: selectivities in [0,1], bounds hold") {
    val rows = run("q_selectivity_independence").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val (sa, sb, est, act) = (r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))
      Seq(sa, sb, est, act).foreach(v => assert(v >= 0.0 && v <= 1.0))
      // Frechet bounds: actual conjunction <= min of marginals
      assert(act <= math.min(sa, sb) + 1e-12)
      assert(math.abs(est - sa * sb) < 1e-12)
    }
  }

  test("q_histogram_selectivity: estimates are probabilities, errors bounded") {
    val rows = run("q_histogram_selectivity").collect()
    assert(rows.map(_.getDouble(0)).toSeq ==
      Seq(25000.0, 50000.0, 75000.0))
    // P(x > c) decreases in c, for both arms
    val est = rows.map(_.getDouble(1))
    val act = rows.map(_.getDouble(2))
    assert(est(0) >= est(1) && est(1) >= est(2))
    assert(act(0) >= act(1) && act(1) >= act(2))
    rows.foreach { r =>
      assert(r.getDouble(1) >= -1e-12 && r.getDouble(1) <= 1.0 + 1e-12)
      // a 10-bucket histogram on near-uniform data stays within a bucket
      assert(r.getDouble(3) < 0.15, s"abs_err ${r.getDouble(3)}")
    }
  }

  test("q_sample_aqp_eval: estimates in the right ballpark") {
    val rows = run("q_sample_aqp_eval").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("A", "N", "R"))
    rows.foreach { r =>
      assert(r.getLong(2) > 0, "sample non-empty per flag")
      // 1% of ~2000 rows/flag: loose but real accuracy bounds
      assert(r.getDouble(5) < 1.0, s"count_rel_err ${r.getDouble(5)}")
      assert(r.getDouble(6) < 0.5, s"mean_rel_err ${r.getDouble(6)}")
    }
  }
}
