package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-8 forecasting/monitoring batch at
  * sf0.001 (exact values ride the DuckDB oracle gate at sf0.01).
  */
class Round8uQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round8uQueries.queries(name)(spark, sf0001)

  test("q_forecast_backtest: three arms over the same 28-day window") {
    val rows = run("q_forecast_backtest").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("drift", "naive", "snaive"))
    rows.foreach { r =>
      assert(r.getLong(1) == 28)
      assert(r.getDouble(2) >= 0.0) // mae
      assert(r.getLong(3) <= 28)
      if (r.getLong(3) > 0) assert(r.getDouble(4) >= 0.0) // mape
    }
  }

  test("q_changepoint_binseg: split partitions the series, gain vs total") {
    val r = run("q_changepoint_binseg").collect()(0)
    val (k, nl, nr) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val (sl, srr, st, gain) =
      (r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))
    assert(k >= 4 && k <= 60 && nl == k && nl + nr == 64)
    assert(sl >= -1e-9 && srr >= -1e-9)
    // splitting can never increase SSE
    assert(gain >= -1e-9)
    assert(math.abs(st - (sl + srr) - gain) < 1e-6)
  }

  test("q_ewma_alert: one row per day, smoother stays in data range") {
    val rows = run("q_ewma_alert").collect()
    assert(rows.length == 63)
    val vmax = rows.map(_.getLong(1)).max.toDouble
    rows.foreach { r =>
      val ew = r.getDouble(2)
      assert(ew >= 0.0 && ew <= vmax + 1e-9, s"ewma $ew out of range")
      assert(Seq("alert", "ok").contains(r.getString(5)))
    }
    // day 0 has no previous level -> no alert possible
    assert(rows(0).getString(5) == "ok" && rows(0).isNullAt(3))
  }
}
