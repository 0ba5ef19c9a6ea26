package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-5w robust-statistics batch at
  * sf0.001 (exact values are covered by the DuckDB oracle gate).
  */
class Round5wQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round5wQueries.queries(name)(spark, sf0001)

  test("q_winsorized_mean: clamping pulls the mean inside [p10, p90]") {
    val rows = run("q_winsorized_mean").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lo, hi) = (r.getDouble(2), r.getDouble(3))
      val win = r.getDouble(5)
      assert(lo <= hi)
      // quantization truncates by < 1e-6 below the true clamped mean
      assert(win >= lo - 1e-6 && win <= hi + 1e-6,
        s"winsorized mean $win outside [$lo, $hi]")
    }
  }

  test("q_autocorr: correlation bounded in [-1, 1]") {
    val rows = run("q_autocorr").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      if (!r.isNullAt(2)) {
        val a = r.getDouble(2)
        assert(a >= -1.0 - 1e-9 && a <= 1.0 + 1e-9)
      }
    }
  }

  test("q_tv_distance: distances in [0, 1], corpus vs itself near 0") {
    val rows = run("q_tv_distance").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tv = r.getDouble(2)
      assert(tv >= -1e-12 && tv <= 1.0 + 1e-12)
    }
  }

  test("q_revenue_bridge: effects decompose the revenue delta exactly") {
    val rows = run("q_revenue_bridge").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (rev1, rev2) = (r.getDouble(3), r.getDouble(4))
      val (vol, rate) = (r.getDouble(5), r.getDouble(6))
      // Δrev = Δn·avg1 + n2·(avg2 − avg1) is an identity
      assert(math.abs((rev2 - rev1) - (vol + rate)) <
        1e-6 * math.max(1.0, math.abs(rev2 - rev1)),
        s"bridge identity broken: $r")
    }
  }
}
