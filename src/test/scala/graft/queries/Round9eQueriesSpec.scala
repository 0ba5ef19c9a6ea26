package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Semantic invariants for the round-9 keyless-temporal-join batch at
  * sf0.001 (exact values ride the DuckDB oracle gate at sf0.01).
  */
class Round9eQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round9eQueries.queries(name)(spark, sf0001)

  test("q_bucketed_range_join matches the naive band join exactly") {
    val r = run("q_bucketed_range_join").collect()(0)
    // naive arm: tiny at sf0.001, the ground truth the bucketing must hit
    val e = graft.Tables(spark, sf0001, "events")
      .select(col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val v = e.filter(col("event_type") === "view")
      .select(col("event_id").as("vid"), col("us").as("v_us"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("us").as("p_us"))
    val naive = v.crossJoin(p)
      .filter(abs(col("p_us") - col("v_us")) <= 60L * 1000000L)
    assert(r.getLong(0) == naive.count())
    assert(r.getLong(1) == naive.select("vid").distinct().count())
    assert(r.getLong(2) == naive.select("pid").distinct().count())
  }

  test("q_nearest_event_join: nearest is a subset of the band pairs") {
    val band = run("q_bucketed_range_join").collect()(0)
    val near = run("q_nearest_event_join").collect()(0)
    // exactly one nearest per matched view
    assert(near.getLong(0) == band.getLong(1))
    assert(near.getLong(2) <= 60L * 1000000L) // max gap inside the band
    assert(near.getLong(3) <= near.getLong(0))
  }

  test("q_asof_global matches a brute-force predecessor scan") {
    val r = run("q_asof_global").collect()(0)
    val e = graft.Tables(spark, sf0001, "events")
      .select(col("event_type"), unix_micros(col("ts")).as("us"))
    val views = e.filter(col("event_type") === "view").collect()
      .map(_.getLong(1))
    val purchases = e.filter(col("event_type") === "purchase").collect()
      .map(_.getLong(1)).sorted
    var matched = 0L; var sumLag = 0L; var maxLag = 0L
    views.foreach { v =>
      val preds = purchases.filter(_ <= v)
      if (preds.nonEmpty) {
        matched += 1; val lag = v - preds.max
        sumLag += lag; maxLag = math.max(maxLag, lag)
      }
    }
    assert(r.getLong(0) == views.length)
    assert(r.getLong(1) == matched)
    assert(r.getLong(2) == sumLag)
    assert(r.getLong(3) == maxLag)
  }
}
