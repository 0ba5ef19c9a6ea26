package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-8 queueing batch at sf0.001
  * (exact values ride the DuckDB oracle gate at sf0.01).
  */
class Round8acQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round8acQueries.queries(name)(spark, sf0001)

  test("q_backlog_lindley: backlog bounded by total arrivals") {
    val r = run("q_backlog_lindley").collect()(0)
    val (c, tot, nMin) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val (maxB, mOfMax, busy, finalB) =
      (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
    assert(nMin == 512)
    assert(c >= 1, "capacity at least one per minute")
    assert(maxB >= 0 && maxB <= tot)
    assert(finalB >= 0 && finalB <= maxB)
    assert(busy >= 0 && busy <= 512)
    assert(mOfMax >= 0 && mOfMax < 512)
    if (maxB > 0) assert(busy > 0)
  }

  test("q_erlang_b: blocking decreases with servers, in (0,1)") {
    val rows = run("q_erlang_b").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(8, 16, 32))
    val bs = rows.map(_.getDouble(3))
    assert(bs(0) > bs(1) && bs(1) > bs(2), "more servers block less")
    rows.foreach { r =>
      val b = r.getDouble(3)
      assert(b > 0.0 && b < 1.0)
      assert(r.getDouble(1) > 0.0 && r.getDouble(2) > 0.0)
      assert(math.abs(r.getDouble(4) -
        r.getDouble(1) * 3600.0 * b) < 1e-9)
    }
  }

  test("q_autoscale_plan: 24 hour slots, workers >= 1") {
    val rows = run("q_autoscale_plan").collect()
    assert(rows.length == 24)
    assert(rows.map(_.getInt(0)).toSeq == (0 to 23))
    rows.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(2) > 0)
      assert(r.getDouble(3) > 0.0)
      assert(r.getLong(4) >= 1)
    }
  }
}
