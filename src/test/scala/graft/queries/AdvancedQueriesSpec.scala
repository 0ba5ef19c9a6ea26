package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the Group D queries at sf0.001 (exact values
  * are covered by the DuckDB oracle gate — these specs guard the
  * properties the formulas must keep under any refactor).
  */
class AdvancedQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    AdvancedQueries.queries(name)(spark, sf0001)

  test("q_asof_join: one row per click, purchase never in the future") {
    val rows = run("q_asof_join").collect()
    val nClicks = graft.Tables(spark, sf0001, "events")
      .filter(col("event_type") === "click").count()
    assert(rows.length == nClicks)
    rows.filter(!_.isNullAt(5)).foreach { r =>
      assert(r.getLong(5) <= r.getLong(2),
        s"purchase at ${r.getLong(5)} after click at ${r.getLong(2)}")
    }
    // at least one click has a prior purchase in a month of events
    assert(rows.exists(!_.isNullAt(4)))
  }

  test("q_gap_islands: island runs partition each user's events") {
    val islands = run("q_gap_islands").collect()
    assert(islands.forall(r => r.getLong(2) >= 1 && r.getLong(3) >= 1))
    // every (user, type) combination present in events appears
    val nCombos = graft.Tables(spark, sf0001, "events")
      .select("user_id", "event_type").distinct().count()
    assert(islands.length == nCombos)
  }

  test("q_scd2_ranges: contiguous non-overlapping history, one open row") {
    val df = run("q_scd2_ranges")
    val n = graft.Tables(spark, sf0001, "events").count()
    assert(df.count() == n)
    // exactly one current (open-ended) version per user
    val curr = df.filter(col("is_current") === 1)
      .groupBy("user_id").count().collect()
    assert(curr.forall(_.getLong(1) == 1))
    // closed ranges are well-formed
    assert(df.filter(col("valid_to_us") < col("valid_from_us")).count() == 0)
  }

  test("q_merge_diff: actions partition the customer set") {
    val rows = run("q_merge_diff").collect()
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    assert(rows.forall(r =>
      Set("insert", "update", "delete").contains(r.getString(1))))
    // an update carries both prices; insert only new; delete only old
    rows.foreach { r =>
      r.getString(1) match {
        case "update" => assert(!r.isNullAt(2) && !r.isNullAt(3))
        case "insert" => assert(r.isNullAt(2) && !r.isNullAt(3))
        case "delete" => assert(!r.isNullAt(2) && r.isNullAt(3))
      }
    }
  }

  test("q_conditional_agg: filtered counts bounded by totals") {
    run("q_conditional_agg").collect().foreach { r =>
      val (total, high) = (r.getLong(1), r.getLong(2))
      assert(high <= total)
      assert(math.abs(r.getDouble(4) - high.toDouble / total) < 1e-12)
    }
  }

  test("q_min_max_by: extremal values bound the arg-extremes") {
    run("q_min_max_by").collect().foreach { r =>
      assert(r.getDouble(1) <= r.getDouble(3)) // latest <= max
      assert(r.getDouble(2) >= r.getDouble(4)) // first >= min
    }
  }

  test("q_bitwise_agg: AND is a submask of OR") {
    run("q_bitwise_agg").collect().foreach { r =>
      val (band, bor) = (r.getLong(1), r.getLong(2))
      assert((band & bor) == band)
    }
  }

  test("q_string_agg: csv arity matches the distinct count") {
    run("q_string_agg").collect().foreach { r =>
      assert(r.getString(1).split(",").length == r.getLong(2))
    }
  }

  test("q_posexplode: five position-tagged tokens per document") {
    val rows = run("q_posexplode").collect()
    val nDocs = graft.Tables(spark, sf0001, "documents").count()
    assert(rows.length == 5 * nDocs)
    assert(rows.forall(r => r.getInt(1) >= 0 && r.getInt(1) < 5))
  }

  test("q_quantile_disc: quartiles are ordered") {
    run("q_quantile_disc").collect().foreach { r =>
      assert(r.getDouble(1) <= r.getDouble(2))
      assert(r.getDouble(2) <= r.getDouble(3))
    }
  }

  test("q_interval_join: one row per click, counts bounded by purchases") {
    val rows = run("q_interval_join").collect()
    val e = graft.Tables(spark, sf0001, "events")
    val nClicks = e.filter(col("event_type") === "click").count()
    val nPurch = e.filter(col("event_type") === "purchase").count()
    assert(rows.length == nClicks)
    assert(rows.forall(r => r.getLong(2) >= 0 && r.getLong(2) <= nPurch))
    // a zero count carries a null sum; a positive count a non-null one
    rows.foreach { r =>
      assert((r.getLong(2) == 0) == r.isNullAt(3))
    }
  }

  test("q_window_nth: exactly two rows per user precede the 3rd value") {
    val rows = run("q_window_nth").collect()
    // the running frame exposes nth_value(3) from the third TIME-ordered
    // row on — so per user exactly min(2, n) rows carry a null
    rows.groupBy(_.getLong(0)).values.foreach { ofUser =>
      val nulls = ofUser.count(_.isNullAt(3))
      assert(nulls == math.min(2, ofUser.size))
    }
  }

  test("q_tpch_q3/q10: bounded top-k with strictly ordered revenue") {
    Seq("q_tpch_q3" -> 10, "q_tpch_q10" -> 20).foreach { case (q, k) =>
      val rows = run(q).collect()
      assert(rows.length <= k)
      val revs = rows.map(r => r.getDouble(r.length - 1))
      assert(revs.zip(revs.tail).forall { case (a, b) => a >= b }, q)
      assert(revs.forall(_ > 0), q)
    }
  }

  test("q_salted_join equals the unsalted join") {
    val salted = run("q_salted_join").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val e = graft.Tables(spark, sf0001, "events")
    val plain = e.groupBy(pmod(col("user_id"), lit(3)).as("tier"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("sum_value"))
      .orderBy("tier").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(salted.toSeq == plain.toSeq)
  }
}
