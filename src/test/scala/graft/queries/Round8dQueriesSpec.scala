package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-8 LM-filtering batch at sf0.001
  * (exact values ride the DuckDB oracle gate at sf0.01).
  */
class Round8dQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round8dQueries.queries(name)(spark, sf0001)

  test("DetMath.dln matches Math.log to 1e-11 on count-scale integers") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val xs = Seq(1L, 2L, 3L, 7L, 31L, 48L, 1000L, 27196L, 500000L,
      1000000007L)
    val got = xs.toDF("x")
      .select(graft.functions.DetMath.dln(col("x"))).as[Double].collect()
    xs.zip(got).foreach { case (x, d) =>
      assert(math.abs(d - math.log(x.toDouble)) < 1e-11,
        s"dln($x) = $d vs ${math.log(x.toDouble)}")
    }
  }

  test("q_unigram_nll: rank stats ordered within each source") {
    val rows = run("q_unigram_nll").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, mn, med, p90, mx) = (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(n > 0)
      assert(mn <= med && med <= p90 && p90 <= mx,
        s"rank picks out of order for ${r.getString(0)}")
      // add-1 smoothed NLL of an observed token is positive and below
      // ln(N+V) (every scored token occurs, so p > 1/(N+V))
      assert(mn > 0.0 && mx < 20.0)
    }
  }

  test("q_kl_sources: KL nonnegative-ish, top term is the max contribution") {
    val rows = run("q_kl_sources").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val kl = r.getDouble(2)
      // smoothed KL between distributions over the same support is >= 0
      // up to the add-1 smoothing's cross-normalization (bounded below
      // by a tiny negative only if distributions are near-identical)
      assert(kl > -1e-3, s"KL unexpectedly negative: $kl")
      assert(r.getString(3).nonEmpty)
      assert(r.getDouble(4) >= kl / r.getLong(1).max(1L),
        "top contribution below the mean contribution")
    }
  }

  test("q_winnowing_fingerprints: density in (0,1], pairs consistent") {
    val rows = run("q_winnowing_fingerprints").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDocs, nWin, nFp, rate, pairs) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getLong(5))
      assert(nDocs > 0 && nWin >= nFp && nFp >= nDocs,
        "each doc with a window keeps >= 1 fingerprint, <= #windows")
      // winnowing guarantee: one fingerprint at least every w=4 windows
      assert(rate > 0.2 && rate <= 1.0, s"fp density $rate outside (0.2,1]")
      assert(pairs >= 0)
    }
  }
}
