package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-5n bitmap-window/association batch
  * at sf0.001 (exact values are covered by the DuckDB oracle gate).
  */
class Round5nQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round5nQueries.queries(name)(spark, sf0001)

  test("q_rolling_distinct_users equals brute-force trailing distinct") {
    val events = graft.Tables(spark, sf0001, "events")
      .select(datediff(to_date(col("ts")), lit("1970-01-01")).as("d"),
        col("user_id"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val byDay = events.groupBy(_._1)
    val days = byDay.keys.toSeq.sorted
    val brute = days.map { d =>
      d -> events.filter(e => e._1 >= d - 6 && e._1 <= d)
        .map(_._2).distinct.length.toLong
    }.toMap
    val got = run("q_rolling_distinct_users").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got.keySet == brute.keySet)
    got.foreach { case (d, n) =>
      assert(n == brute(d), s"day $d: bitmap $n != brute ${brute(d)}")
    }
  }

  test("q_rolling_distinct_users: rolling >= same-day actives") {
    run("q_rolling_distinct_users").collect().foreach { r =>
      // day_user_slots counts per-bucket same-day actives, which the
      // trailing-7-day union can only meet or exceed
      assert(r.getLong(1) >= r.getLong(2))
    }
  }

  test("q_chi2_cells: marginals consistent, contribution formula exact") {
    val rows = run("q_chi2_cells").collect()
    assert(rows.nonEmpty)
    val total = rows.head.getLong(5)
    assert(rows.map(_.getLong(2)).sum == total)
    rows.foreach { r =>
      val (o, rr, cc, t, dev) = (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))
      assert(dev == o * t - rr * cc)
      assert(r.getDouble(7) ==
        (dev * dev).toDouble / (rr * cc * t))
    }
  }
}
