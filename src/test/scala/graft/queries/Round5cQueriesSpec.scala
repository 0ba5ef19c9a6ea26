package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-5c layout/monitoring batch at
  * sf0.001 (exact values are covered by the DuckDB oracle gate).
  */
class Round5cQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round5cQueries.queries(name)(spark, sf0001)

  test("q_zorder_layout: every file's bbox is tight on BOTH dimensions") {
    val rows = run("q_zorder_layout").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (minPx, maxPx) = (r.getLong(2), r.getLong(3))
      val (minSy, maxSy) = (r.getLong(4), r.getLong(5))
      // z // 1024 fixes Morton bits 10..15 = the high 3 bits of each
      // dimension, so within a file both keys vary by at most 31 —
      // the locality property that makes min/max stats prune on
      // either predicate column
      assert(maxPx - minPx <= 31, s"px box too wide in $r")
      assert(maxSy - minSy <= 31, s"sy box too wide in $r")
    }
  }

  test("q_range_layout: 16 balanced buckets with ordered fences") {
    val rows = run("q_range_layout").collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 16))
    val counts = rows.map(_.getLong(1))
    assert(counts.max - counts.min <= 1)
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getDouble(3) <= b.getDouble(2))
      case _ =>
    }
  }

  test("q_mad_outliers: med is a data value, outliers obey the gate") {
    val rows = run("q_mad_outliers").collect()
    assert(rows.nonEmpty)
    val byType = graft.Tables(spark, sf0001, "events")
      .select("event_type", "value").collect()
      .groupBy(_.getString(0)).map { case (k, v) =>
        k -> v.map(_.getDouble(1)) }
    rows.foreach { r =>
      val vs = byType(r.getString(0))
      val (n, med, mad, out) =
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))
      assert(n == vs.length && vs.contains(med) && mad >= 0.0)
      assert(out == vs.count(v => math.abs(v - med) > mad * 3))
    }
  }

  test("q_event_rate_alert: trail is the prior-10-minute sum, alert exact") {
    val rows = run("q_event_rate_alert").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, g) =>
      val byMin = g.map(r => r.getLong(1) -> r.getLong(2)).toMap
      g.foreach { r =>
        val m = r.getLong(1)
        val expect = (m - 10 to m - 1).flatMap(byMin.get).sum
        assert(r.getLong(3) == expect)
        assert(r.getBoolean(4) ==
          (r.getLong(2) * 10 > expect * 3 && r.getLong(2) >= 5))
      }
    }
  }
}
