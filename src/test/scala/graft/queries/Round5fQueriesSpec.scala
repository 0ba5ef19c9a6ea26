package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-5f skew/cardinality batch at
  * sf0.001 (exact values are covered by the DuckDB oracle gate).
  */
class Round5fQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round5fQueries.queries(name)(spark, sf0001)

  test("q_heavy_hitters: descending counts, exact shares") {
    val rows = run("q_heavy_hitters").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.map(_.getInt(0)).toSeq == (1 to rows.length))
    val counts = rows.map(_.getLong(2))
    assert(counts.sameElements(counts.sorted.reverse))
    val total = rows.head.getLong(3)
    rows.foreach { r =>
      assert(r.getLong(5) == r.getLong(2) * r.getLong(4))
      assert(r.getDouble(6) == r.getLong(2).toDouble / total)
    }
  }

  test("q_bitmap_distinct: popcount sum equals exact countDistinct") {
    val rows = run("q_bitmap_distinct").collect()
    assert(rows.nonEmpty)
    val exact = graft.Tables(spark, sf0001, "events")
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.countDistinct("user_id"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) == exact(r.getString(0)),
        s"bitmap distinct diverges for ${r.getString(0)}")
      assert(r.getLong(2) <= r.getLong(1)) // buckets <= set bits
    }
  }

  test("q_asof_forward: every match is the first at-or-after purchase") {
    val rows = run("q_asof_forward").collect()
    assert(rows.nonEmpty)
    val purchases = graft.Tables(spark, sf0001, "events")
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .selectExpr("user_id", "unix_micros(ts) as us", "event_id")
      .collect().groupBy(_.getLong(0))
    rows.foreach { r =>
      val clickUs = r.getLong(2)
      val future = purchases.getOrElse(r.getLong(0), Array.empty)
        .filter(_.getLong(1) >= clickUs)
      if (r.isNullAt(5)) assert(future.isEmpty)
      else assert(r.getLong(5) ==
        future.map(p => (p.getLong(1), p.getLong(2))).min._1)
    }
  }

  test("q_sessionize_cap: sub-sessions never exceed the 60-minute cap") {
    val rows = run("q_sessionize_cap").collect()
    assert(rows.nonEmpty)
    val capUs = 60L * 60 * 1000 * 1000
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(5))
      assert(r.getLong(5) - r.getLong(4) < capUs) // span inside one cap slot
    }
    // splitting is a refinement: total events reconcile
    val total = graft.Tables(spark, sf0001, "events").count()
    assert(rows.map(_.getLong(3)).sum == total)
  }
}
