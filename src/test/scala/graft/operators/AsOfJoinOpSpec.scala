package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** The native as-of join operator (custom LogicalPlan + Strategy +
  * SparkPlan) must agree EXACTLY with the established union+window
  * rewrite (q_asof_join, oracle-verified since round 2) on the real
  * events table, handle unmatched/null-key rows as a left join, and
  * plan with the sort-merge shuffle shape.
  */
class AsOfJoinOpSpec extends AnyFunSuite with SparkSuite {

  private def events = graft.Tables(spark, sf0001, "events")
    .withColumn("us", expr("unix_micros(ts)"))

  private def nativeAsof = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("us").as("click_us"),
        col("value").as("click_value"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("p_id"),
        col("us").as("p_us"), col("value").as("p_value"))
    AsOfJoinOps.asofJoin(clicks, purchases,
      leftKeys = Seq("user_id"), rightKeys = Seq("p_user"),
      leftTime = "click_us", rightTime = "p_us",
      rightTieBreak = Seq("p_id"))
  }

  test("native as-of equals the oracle-verified window rewrite") {
    val native = nativeAsof
      .select(col("user_id"), col("event_id"), col("click_us"),
        col("click_value"), col("p_value").as("last_purchase_value"),
        col("p_us").as("last_purchase_us"))
      .orderBy("user_id", "event_id")
      .collect()
    val window = graft.queries.AdvancedQueries
      .queries("q_asof_join")(spark, sf0001)
      .collect()
    assert(native.length == window.length)
    native.zip(window).foreach { case (n, w) =>
      assert(n.toSeq == w.toSeq, s"native $n vs window $w")
    }
  }

  test("plans as AsOfJoinExec with clustered exchanges and sorts") {
    val plan = nativeAsof.queryExecution.executedPlan
    val execs = plan.collect { case a: AsOfJoinExec => a }
    assert(execs.length == 1, plan.toString)
    val s = plan.toString
    assert(s.contains("Exchange hashpartitioning"), s)
    assert(s.contains("Sort ["), s)
  }

  test("unmatched and null-key left rows null-pad like a left join") {
    import spark.implicits._
    val left = Seq(
      (Some(1L), 100L, "l1"), // matched
      (Some(1L), 5L, "l0"),   // before any right row -> null
      (Some(2L), 50L, "l2"),  // key with no right rows -> null
      (None, 100L, "l3")      // null key -> null
    ).toDF("k", "t", "tag")
    val right = Seq(
      (Some(1L), 10L, "r10"), (Some(1L), 90L, "r90"),
      (Some(1L), 101L, "r101"),
      (None.asInstanceOf[Option[Long]], 1L, "rnull")
    ).toDF("rk", "rt", "rtag")
    val got = AsOfJoinOps.asofJoin(left, right,
        Seq("k"), Seq("rk"), "t", "rt")
      .select("tag", "rtag").collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(got == Map("l1" -> "r90", "l0" -> null, "l2" -> null,
      "l3" -> null))
  }

  test("tie-break picks the last right row at equal times") {
    import spark.implicits._
    val left = Seq((7L, 100L)).toDF("k", "t")
    val right = Seq((7L, 100L, 1L, "first"), (7L, 100L, 2L, "second"))
      .toDF("rk", "rt", "seq", "rtag")
    val got = AsOfJoinOps.asofJoin(left, right,
        Seq("k"), Seq("rk"), "t", "rt", rightTieBreak = Seq("seq"))
      .select("rtag").collect().map(_.getString(0)).toSeq
    assert(got == Seq("second"))
  }

  test("forward direction equals the window rewrite (q_asof_forward)") {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("us").as("click_us"),
        col("value").as("click_value"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("p_id"),
        col("us").as("p_us"), col("value").as("p_value"))
    val native = AsOfJoinOps.asofJoin(clicks, purchases,
        Seq("user_id"), Seq("p_user"), "click_us", "p_us",
        Seq("p_id"), direction = "forward")
      .select(col("user_id"), col("event_id"), col("click_us"),
        col("click_value"), col("p_value").as("next_purchase_value"),
        col("p_us").as("next_purchase_us"))
      .orderBy("user_id", "event_id").collect()
    val window = graft.queries.Round5fQueries
      .queries("q_asof_forward")(spark, sf0001).collect()
    assert(native.length == window.length)
    native.zip(window).foreach { case (n, w) =>
      assert(n.toSeq == w.toSeq, s"native $n vs window $w")
    }
  }

  test("self-derived sides get fresh ids (no ambiguous attributes)") {
    // both sides filter the SAME DataFrame — the re-alias inside
    // asofJoin must keep the node resolvable
    val base = events.select(col("user_id"), col("event_id"), col("us"))
    val l = base.filter(col("event_id") % 2 === 0)
      .select(col("user_id"), col("event_id"), col("us"))
    val r = base.filter(col("event_id") % 2 === 1)
      .select(col("user_id").as("ru"), col("event_id").as("rid"),
        col("us").as("rus"))
    val out = AsOfJoinOps.asofJoin(l, r, Seq("user_id"), Seq("ru"),
      "us", "rus", Seq("rid"))
    assert(out.columns.toSeq ==
      Seq("user_id", "event_id", "us", "ru", "rid", "rus"))
    assert(out.count() > 0)
  }
}
