package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-9 ClickHouse-combinator batch at
  * sf0.001 (exact values ride the DuckDB oracle gate at sf0.01).
  */
class Round9aQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round9aQueries.queries(name)(spark, sf0001)

  test("q_window_funnel: levels partition the user population monotonically") {
    val rows = run("q_window_funnel").collect()
    val levels = rows.map(_.getInt(0)).toSeq
    assert(levels == levels.sorted && levels.toSet.subsetOf(Set(0, 1, 2, 3)))
    val byLevel = rows.map(r => r.getInt(0) -> r.getLong(1)).toMap
    // every user with events lands in exactly one level
    val nUsers = byLevel.values.sum
    val distinctUsers = graft.Tables(spark, sf0001, "events")
      .select("user_id").distinct().count()
    assert(nUsers == distinctUsers)
    // reaching level k requires a view, so levels 2/3 never exceed
    // the view-anchored population
    val l23 = byLevel.getOrElse(2, 0L) + byLevel.getOrElse(3, 0L)
    assert(l23 + byLevel.getOrElse(1, 0L) <= nUsers)
  }

  test("q_window_funnel: window cap binds — tighter than the uncapped chain") {
    // the 1h-window funnel can never admit MORE users to level 3 than
    // an uncapped view->click->purchase chain over the same events
    val ev = graft.Tables(spark, sf0001, "events")
    import org.apache.spark.sql.functions._
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(unix_micros(col("ts"))).as("t1"))
    val c = ev.filter(col("event_type") === "click").as("e")
      .join(v.as("f"), "user_id")
      .filter(unix_micros(col("e.ts")) > col("t1"))
      .groupBy("user_id").agg(min(unix_micros(col("e.ts"))).as("t2"))
    val p = ev.filter(col("event_type") === "purchase").as("e")
      .join(c.as("f"), "user_id")
      .filter(unix_micros(col("e.ts")) > col("t2"))
      .select("user_id").distinct().count()
    val capped = run("q_window_funnel").collect()
      .find(_.getInt(0) == 3).map(_.getLong(1)).getOrElse(0L)
    assert(capped <= p)
  }

  test("q_sequence_count_vc: counters are mutually consistent") {
    val r = run("q_sequence_count_vc").collect()(0)
    val (users, total, withVc, maxVc) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(users > 0)
    assert(withVc <= users)
    assert(total >= withVc) // each matching user contributes >= 1
    assert(maxVc <= total && total <= maxVc * users)
    if (total == 0) assert(withVc == 0 && maxVc == 0)
  }

  test("q_summap_pivot: long-form entries hour-sorted, cardinality honest") {
    // r9 verdict #1: the map rides as sorted (event_type, h, hv) rows +
    // per-type cardinality — scalar columns only (driver-sortable)
    val rows = run("q_summap_pivot").collect()
    assert(rows.map(_.getString(0)).distinct.toSeq ==
      Seq("click", "error", "purchase", "signup", "view"))
    rows.groupBy(_.getString(0)).foreach { case (_, g) =>
      val hours = g.map(_.getLong(1)).toSeq
      assert(hours == hours.sorted && hours.distinct == hours)
      assert(hours.forall(h => h >= 0L && h <= 23L))
      // every row of a type carries that type's entry count
      assert(g.map(_.getLong(3)).distinct.toSeq == Seq(g.length.toLong))
    }
    // no complex-typed output columns (the unverifiable-shape class)
    assert(run("q_summap_pivot").schema.fields.forall(f =>
      !f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]))
  }

  test("q_summap_pivot: per-type entry sums reconcile with the flat total") {
    import org.apache.spark.sql.functions._
    val entryTotal = run("q_summap_pivot")
      .agg(sum(col("hv"))).collect()(0).getDouble(0)
    val flatTotal = graft.Tables(spark, sf0001, "events")
      .agg(sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
        .cast("double")).collect()(0).getDouble(0)
    // per-(type,hour) decimal partials are exact; only the final double
    // folds differ in association order
    assert(math.abs(entryTotal - flatTotal) <= 1e-6 * math.abs(flatTotal))
  }
}
