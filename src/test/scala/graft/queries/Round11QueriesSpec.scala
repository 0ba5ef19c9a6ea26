package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-11 batches at sf0.001 — exact
  * values ride the DuckDB oracle gate at sf0.01/sf0.001; these pin the
  * properties a hash compare can't express.
  */
class Round11QueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(m: Map[String, (org.apache.spark.sql.SparkSession,
    String) => org.apache.spark.sql.DataFrame], name: String) =
    m(name)(spark, sf0001)

  // ---- 11a: temporal band joins --------------------------------------

  test("q_ts_band_join_auto equals q_range_join_auto (raw-timestamp vs " +
    "pre-converted micros formulation)") {
    val a = run(Round11aQueries.queries, "q_ts_band_join_auto").collect()
    val b = run(Round10aQueries.queries, "q_range_join_auto").collect()
    assert(a.length == 1 && b.length == 1)
    assert(a.head == b.head)
  }

  test("q_ts_between_join_auto equals q_between_join_auto") {
    val a = run(Round11aQueries.queries, "q_ts_between_join_auto").collect()
    val b = run(Round10aQueries.queries, "q_between_join_auto").collect()
    assert(a.length == 1 && b.length == 1)
    assert(a.head == b.head)
  }

  test("temporal and decimal band-join keys plan without a nested-loop join") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    val all = Round11aQueries.queries ++ Round11dQueries.queries
    for (k <- Seq("q_ts_band_join_auto", "q_ts_between_join_auto",
      "q_date_band_join_auto", "q_date_between_join_auto",
      "q_price_band_join_auto", "q_price_between_join_auto")) {
      val df = run(all, k)
      val bad = graft.plans.PlanSignature.nodes(df.queryExecution.executedPlan)
        .exists {
          case _: BroadcastNestedLoopJoinExec | _: CartesianProductExec => true
          case _ => false
        }
      assert(!bad, s"$k planned a nested-loop join")
    }
  }

  // ---- 11b: windowFunnel strict modes --------------------------------

  /** Per-user level dominance: a chain valid under strict_order is
    * consecutive events, hence free of repeated-condition interventions
    * (valid under strict_deduplication), hence a valid default chain —
    * so the survivor counts at every level k must be ordered
    * strict_order <= strict_dedup <= default.
    */
  test("funnel strict-mode dominance: strict_order <= strict_dedup <= default") {
    def cum(m: Map[String, (org.apache.spark.sql.SparkSession,
      String) => org.apache.spark.sql.DataFrame], name: String): Map[Int, Long] = {
      val h = run(m, name).collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      (0 to 3).map(k => k -> (k to 3).map(j => h.getOrElse(j, 0L)).sum).toMap
    }
    val so = cum(Round11bQueries.queries, "q_funnel_strict_order")
    val sd = cum(Round11bQueries.queries, "q_funnel_strict_dedup")
    val df = cum(Round9aQueries.queries, "q_window_funnel")
    for (k <- 1 to 3) {
      assert(so(k) <= sd(k), s"strict_order > strict_dedup at level $k")
      assert(sd(k) <= df(k), s"strict_dedup > default at level $k")
    }
    // identical total user population across all three histograms
    assert(so(0) == sd(0) && sd(0) == df(0))
  }

  test("q_sequence_match_timed: matches bounded by the untimed pair count") {
    val r = run(Round11bQueries.queries, "q_sequence_match_timed")
      .collect().head
    val nUsers = r.getLong(0)
    val matched = r.getLong(1)
    val total = r.getLong(2)
    val maxPer = r.getLong(3)
    val both = r.getLong(4)
    assert(matched <= both, "a timed match needs at least one v and one c")
    assert(matched <= total)
    assert(maxPer <= total)
    assert(both <= nUsers)
  }

  // ---- 11c: combinator analogs ---------------------------------------

  test("q_cramers_v: association measures live in [0, 1] and chi2 >= 0") {
    val r = run(Round11cQueries.queries, "q_cramers_v").collect().head
    assert(r.getDouble(1) >= 0.0) // chi2
    val v = r.getDouble(2)
    assert(v >= 0.0 && v <= 1.0, s"cramers_v $v")
    for (i <- 3 to 4) {
      val u = r.getDouble(i)
      assert(u >= -1e-9 && u <= 1.0 + 1e-9, s"theils_u($i) $u")
    }
  }

  test("q_group_bitmap_ops: AND <= XOR-parity <= OR, memberships bound") {
    val r = run(Round11cQueries.queries, "q_group_bitmap_ops")
      .collect().head
    val or = r.getLong(0); val and = r.getLong(1); val xor = r.getLong(2)
    assert(and <= or && xor <= or)
    assert(r.getLong(3) <= 7) // max distinct weekdays
    assert(r.getLong(4) <= or * 7) // sum of memberships
  }

  test("q_sequence_timed_sweep: match counts grow with the window") {
    val rows = run(Round11cQueries.queries, "q_sequence_timed_sweep")
      .collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == Seq(60L, 600L, 3600L))
    val users = rows.map(_.getLong(1))
    val matches = rows.map(_.getLong(2))
    assert(users.sliding(2).forall(p => p(0) <= p(1)))
    assert(matches.sliding(2).forall(p => p(0) <= p(1)))
    // the 3600 s row must agree with q_sequence_match_timed
    val timed = run(Round11bQueries.queries, "q_sequence_match_timed")
      .collect().head
    assert(rows.last.getLong(1) == timed.getLong(1))
    assert(rows.last.getLong(2) == timed.getLong(2))
  }

  test("q_min_max_map: vmin <= vmax on every entry, cardinality consistent") {
    val rows = run(Round11cQueries.queries, "q_min_max_map").collect()
    rows.filter(r => !r.isNullAt(2) && !r.isNullAt(3))
      .foreach(r => assert(r.getDouble(2) <= r.getDouble(3)))
    val byType = rows.groupBy(_.getString(0))
    byType.foreach { case (_, rs) =>
      assert(rs.map(_.getLong(5)).distinct.length == 1)
      assert(rs.head.getLong(5) == rs.length)
    }
  }

  // ---- 11e: statistical tests / series downsampling ------------------

  test("q_welch_ttest: df bounds and sign agreement between variants") {
    val r = run(Round11eQueries.queries, "q_welch_ttest").collect().head
    val (n1, n2) = (r.getLong(0), r.getLong(1))
    assert(n1 > 1 && n2 > 1)
    val tw = r.getDouble(3); val dfw = r.getDouble(4)
    val ts = r.getDouble(5); val dfs = r.getLong(6)
    // Welch-Satterthwaite df lies in [min(n)-1, n1+n2-2]
    assert(dfw >= math.min(n1, n2) - 1 - 1e-9 && dfw <= dfs + 1e-9)
    assert(math.signum(tw) == math.signum(ts))
    assert(math.signum(tw) == math.signum(r.getDouble(2)))
  }

  test("q_lttb_downsample: 30 buckets, endpoints kept, x increasing") {
    val rows = run(Round11eQueries.queries, "q_lttb_downsample")
      .collect()
    assert(rows.length == 30)
    val xs = rows.map(_.getLong(1))
    assert(xs.sliding(2).forall(p => p(0) < p(1)))
    val series = graft.Tables(spark, sf0001, "events")
      .filter(col("ts").isNotNull)
      .select(expr("unix_date(to_date(ts))").cast("long").as("x"))
      .agg(min("x"), max("x")).collect().head
    assert(xs.head == series.getLong(0), "first point not kept")
    assert(xs.last == series.getLong(1), "last point not kept")
  }

  test("q_tukey_fences: quartile order and outlier bounds") {
    val rows = run(Round11eQueries.queries, "q_tukey_fences").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, q1, q3) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
      assert(q1 <= q3)
      assert(math.abs(r.getDouble(4) - (q3 - q1)) < 1e-12)
      assert(r.getLong(5) + r.getLong(6) <= n)
    }
  }

  test("q_group_array_moving: mov_sum7 telescopes over the 7-row frame") {
    val rows = run(Round11bQueries.queries, "q_group_array_moving")
      .collect()
    val byType = rows.groupBy(_.getString(0))
    byType.foreach { case (_, rs) =>
      val daily = rs.map(_.getDouble(2))
      val mov = rs.map(_.getDouble(3))
      for (i <- rs.indices) {
        val lo = math.max(0, i - 6)
        val expect = (lo to i).map(daily).sum
        assert(math.abs(mov(i) - expect) < 1e-6,
          s"mov_sum7 mismatch at row $i")
        val avg = rs(i).getDouble(4)
        assert(avg == mov(i) / (i - lo + 1).toDouble)
      }
    }
  }
}
