package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-12 batches at sf0.001 — exact
  * values ride the DuckDB oracle gate at sf0.01/sf0.001; these pin the
  * properties a hash compare can't express.
  */
class Round12QueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(m: Map[String, (org.apache.spark.sql.SparkSession,
    String) => org.apache.spark.sql.DataFrame], name: String) =
    m(name)(spark, sf0001)

  // ---- 12a: TimestampNTZ band joins ----------------------------------

  test("q_ntz_band_join_auto equals the same band on TimestampType " +
    "(cast TZ->NTZ is a micros identity under the pinned-UTC session)") {
    import org.apache.spark.sql.functions._
    val a = run(Round12aQueries.queries, "q_ntz_band_join_auto").collect()
    val e = graft.Tables(spark, sf0001, "events")
      .select(col("event_id"), col("event_type"), col("value"), col("ts"))
    val views = e.filter(col("event_type") === "view")
      .select(col("event_id").as("vid"), col("ts").as("v_ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("ts").as("p_ts"),
        col("value").as("p_value"))
    val b = views.join(purchases,
        abs(col("p_ts") - col("v_ts")) <= expr("INTERVAL '45' SECOND"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("vid")).as("n_views_matched"),
        countDistinct(col("pid")).as("n_purchases_matched"),
        sum(col("p_value").cast(org.apache.spark.sql.types
          .DecimalType(18, 2)))
          .cast("string").cast("double").as("sum_value"))
      .collect()
    assert(a.length == 1 && b.length == 1)
    assert(a.head == b.head)
  }

  // ---- 12b: deterministic heavy hitters ------------------------------

  test("q_topk_space_saving: provable threshold guarantee, ranked exact counts") {
    val rows = run(Round12bQueries.queries, "q_topk_space_saving").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    // the superset guarantee (every >= N/200 key is a candidate) is a
    // THEOREM of the averaging argument — it must read true always
    assert(rows.forall(_.getBoolean(6)), "threshold_covered violated")
    assert(rows.forall(r => r.getLong(4) <= r.getLong(3)),
      "more candidates than keys")
    val ns = rows.sortBy(_.getInt(0)).map(_.getLong(2))
    assert(ns.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)),
      "top-10 not ordered by exact count")
  }

  test("q_topk_weighted: weighted variant holds the same guarantees") {
    val rows = run(Round12bQueries.queries, "q_topk_weighted").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    assert(rows.forall(_.getBoolean(7)), "threshold_covered violated")
    val ws = rows.sortBy(_.getInt(0)).map(_.getLong(2))
    assert(ws.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("q_any_heavy: Boyer-Moore guarantee holds, counts consistent") {
    val rows = run(Round12bQueries.queries, "q_any_heavy").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(6), s"bm_guarantee_holds false for ${r.getString(0)}")
      assert(r.getLong(3) <= r.getLong(1), "mode count exceeds group size")
      assert(r.getLong(4) <= 16L * 1, "more candidates than shards per type")
      assert(r.getBoolean(5) == (r.getLong(3) * 2 > r.getLong(1)))
    }
  }

  test("q_sparkbar: 0..8 levels, max bucket at level 8, counts conserve") {
    import org.apache.spark.sql.functions._
    val rows = run(Round12bQueries.queries, "q_sparkbar").collect()
    assert(rows.nonEmpty && rows.length <= 32)
    assert(rows.forall(r => r.getLong(3) >= 0 && r.getLong(3) <= 8))
    assert(rows.exists(_.getLong(3) == 8), "max-count bucket must hit level 8")
    assert(rows.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 32))
    val total = graft.Tables(spark, sf0001, "events")
      .filter(col("ts").isNotNull).count()
    assert(rows.map(_.getLong(2)).sum == total, "bucket counts don't conserve")
  }

  // ---- 12c: rank tests / association / sequence & interval analogs ---

  test("q_mann_whitney_u: U within range, z sign matches the U excess") {
    val r = run(Round12cQueries.queries, "q_mann_whitney_u").collect().head
    val (n1, n2, twoU1) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(twoU1 >= 0 && twoU1 <= 2 * n1 * n2, "U out of [0, n1*n2]")
    if (!r.isNullAt(4)) {
      val z = r.getDouble(4)
      assert(math.signum(z) == math.signum((twoU1 - n1 * n2).toDouble))
    }
  }

  test("q_spearman_rho: |rho| <= 1, rank variances non-negative") {
    val r = run(Round12cQueries.queries, "q_spearman_rho").collect().head
    if (!r.isNullAt(1))
      assert(math.abs(r.getDouble(1)) <= 1.0 + 1e-12)
    assert(r.getDouble(2) >= 0.0 && r.getDouble(3) >= 0.0)
  }

  test("q_sequence_count_greedy: min-cut bound holds, counts consistent") {
    val r = run(Round12cQueries.queries, "q_sequence_count_greedy")
      .collect().head
    assert(r.getBoolean(4), "greedy exceeded min(views, purchases) bound")
    assert(r.getLong(1) <= r.getLong(0))
    assert(r.getLong(3) <= r.getLong(2))
  }

  test("q_max_intersections: concurrency within [1, sessions] per day") {
    val rows = run(Round12cQueries.queries, "q_max_intersections").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= 1 && r.getLong(2) <= r.getLong(1),
        s"day ${r.get(0)}: max ${r.getLong(2)} vs n ${r.getLong(1)}")
    }
  }

  test("q_contingency_coef: bounds hold and chi2 agrees with q_cramers_v") {
    val r = run(Round12cQueries.queries, "q_contingency_coef").collect().head
    val chi2 = r.getDouble(1)
    assert(chi2 >= 0.0)
    assert(r.getDouble(2) >= 0.0 && r.getDouble(2) < 1.0) // C in [0, 1)
    assert(r.getDouble(3) >= 0.0)                         // phi2
    if (!r.isNullAt(4))
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0 + 1e-9)
    // same contingency table, same fold => bitwise-identical chi2
    val cv = run(Round11cQueries.queries, "q_cramers_v").collect().head
    assert(chi2 == cv.getDouble(1), "chi2 diverges from q_cramers_v")
  }

  // ---- 12d: interval algebra over the session sweep -------------------

  test("interval identities: union <= naive, histogram mass reconciles") {
    val union = run(Round12dQueries.queries, "q_interval_length_sum")
      .collect().map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    union.foreach { case (day, (n, u, naive)) =>
      assert(u <= naive, s"$day union exceeds naive session mass")
      assert(u > 0 || n == 0)
    }
    val hist = run(Round12dQueries.queries, "q_concurrency_histogram")
      .collect().groupBy(_.getDate(0).toString)
    hist.foreach { case (day, rows) =>
      val (n, u, _) = union(day)
      // k>=1 time mass equals the union length...
      assert(rows.map(_.getLong(2)).sum == u, s"$day union mass mismatch")
      // ...and the k-WEIGHTED mass equals n_sessions x 300 s exactly
      val weighted = rows.map(r => r.getLong(1) * r.getLong(2)).sum
      assert(weighted == n * 300000000L, s"$day weighted mass mismatch")
    }
    // peak agreement with q_max_intersections
    val peaks = run(Round12cQueries.queries, "q_max_intersections")
      .collect().map(r => r.getDate(0).toString -> r.getLong(2)).toMap
    hist.foreach { case (day, rows) =>
      assert(rows.map(_.getLong(1)).max == peaks(day),
        s"$day histogram peak != max_intersections")
    }
  }

  // ---- 12e: statistical-test tail ------------------------------------

  test("q_ks_test: two-level prefix sum equals the naive one-window KS") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val a = run(Round12eQueries.queries, "q_ks_test").collect().head
    // naive single-window recomputation (the shape the two-level split
    // replaces): same integers must fall out
    val ord = graft.Tables(spark, sf0001, "orders")
      .filter(col("o_orderstatus").isin("F", "O"))
      .select(col("o_totalprice")
        .cast(org.apache.spark.sql.types.DecimalType(18, 2)).as("v"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("g1"),
        when(col("o_orderstatus") === "O", 1L).otherwise(0L).as("g2"))
    val tot = ord.agg(sum("g1").as("n1"), sum("g2").as("n2")).collect().head
    val (n1, n2) = (tot.getLong(0), tot.getLong(1))
    val naive = ord.groupBy("v")
      .agg(sum("g1").as("c1"), sum("g2").as("c2"))
      .withColumn("cum1", sum("c1").over(Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("cum2", sum("c2").over(Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)))
      .agg(max(abs(col("cum1") * n2 - col("cum2") * n1)))
      .collect().head.getLong(0)
    assert(a.getLong(0) == n1 && a.getLong(1) == n2)
    assert(a.getLong(2) == naive, "two-level prefix sum diverged from naive")
    assert(a.getDouble(3) >= 0.0 && a.getDouble(3) <= 1.0, "D out of [0,1]")
  }

  test("q_simple_linreg agrees with covar/var built-ins to 1e-9 relative") {
    import org.apache.spark.sql.functions._
    val a = run(Round12eQueries.queries, "q_simple_linreg").collect().head
    val ref = graft.Tables(spark, sf0001, "lineitem")
      .agg(covar_pop(col("l_quantity"), col("l_extendedprice")).as("cov"),
        var_pop(col("l_quantity")).as("vx"),
        avg(col("l_quantity")).as("mx"),
        avg(col("l_extendedprice")).as("my"),
        corr(col("l_quantity"), col("l_extendedprice")).as("r"))
      .collect().head
    val slope = ref.getDouble(0) / ref.getDouble(1)
    val icept = ref.getDouble(3) - slope * ref.getDouble(2)
    def rel(x: Double, y: Double) = math.abs(x - y) /
      math.max(1.0, math.max(math.abs(x), math.abs(y)))
    assert(rel(a.getDouble(1), slope) < 1e-9, "slope diverged")
    assert(rel(a.getDouble(2), icept) < 1e-9, "intercept diverged")
    assert(rel(a.getDouble(3), ref.getDouble(4) * ref.getDouble(4)) < 1e-9,
      "r2 diverged from corr^2")
  }

  test("q_mean_ztest: CI brackets the mean diff; z sign matches") {
    val r = run(Round12eQueries.queries, "q_mean_ztest").collect().head
    if (!r.isNullAt(3)) {
      val (diff, z) = (r.getDouble(2), r.getDouble(3))
      assert(r.getDouble(4) <= diff && diff <= r.getDouble(5),
        "CI fails to bracket the observed difference")
      assert(z.sign == diff.sign || diff == 0.0, "z sign mismatch")
    }
  }

  // ---- 12f: time-series aggregate tail -------------------------------

  test("q_delta_sum_timestamp: delta_sum >= 0, moves reconcile with events") {
    val rows = run(Round12fQueries.queries, "q_delta_sum_timestamp").collect()
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.0, "positive-delta sum went negative")
      // n-1 adjacent pairs per type: increases + decreases <= n - 1
      assert(r.getLong(3) + r.getLong(4) <= r.getLong(1) - 1,
        s"${r.getString(0)}: more moves than adjacent pairs")
    }
  }

  test("q_quantile_timing: quantiles ordered, bins on the CH timing grid") {
    val r = run(Round12fQueries.queries, "q_quantile_timing").collect().head
    if (!r.isNullAt(1)) {
      val (q50, q90, q99) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(q50 <= q90 && q90 <= q99, "quantiles out of order")
      for (q <- Seq(q50, q90, q99))
        assert(q == 30000L || q < 1024L || q % 64 == 0,
          s"bin $q off the 1ms/64ms/30s grid")
    }
  }

  test("q_exp_moving_avg: EMA bounded by the hourly-mean range") {
    import org.apache.spark.sql.functions._
    val rows = run(Round12fQueries.queries, "q_exp_moving_avg").collect()
    assert(rows.nonEmpty)
    val hourly = graft.Tables(spark, sf0001, "events")
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .groupBy(col("event_type"), hour(col("ts")).as("h"))
      .agg(avg(col("value")).as("hv"))
      .groupBy("event_type")
      .agg(min("hv").as("lo"), max("hv").as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    rows.foreach { r =>
      val (lo, hi) = hourly(r.getString(0))
      // the fold starts at 0 and half-weights history: EMA sits within
      // [min(0, lo), max(0, hi)] with ~1% slack for the decayed-to-zero
      // initial mass
      val eps = math.max(1.0, math.abs(hi)) * 0.01
      assert(r.getDouble(2) >= math.min(0.0, lo) - eps &&
        r.getDouble(2) <= math.max(0.0, hi) + eps,
        s"${r.getString(0)}: EMA outside hourly-mean envelope")
    }
  }

  // ---- 12g: moment/association aggregates ----------------------------

  test("q_moments agrees with Spark's built-in skewness/kurtosis") {
    import org.apache.spark.sql.functions._
    val a = run(Round12gQueries.queries, "q_moments").collect().head
    val ref = graft.Tables(spark, sf0001, "lineitem")
      .agg(skewness(col("l_discount")).as("sk"),
        kurtosis(col("l_discount")).as("ku"),
        var_pop(col("l_discount")).as("vp"))
      .collect().head
    def rel(x: Double, y: Double) = math.abs(x - y) /
      math.max(1.0, math.max(math.abs(x), math.abs(y)))
    assert(rel(a.getDouble(2), ref.getDouble(2)) < 1e-9, "var_pop diverged")
    assert(rel(a.getDouble(4), ref.getDouble(0)) < 1e-9, "skew diverged")
    // Spark's kurtosis() is EXCESS kurtosis: kurt_pop - 3
    assert(rel(a.getDouble(5) - 3.0, ref.getDouble(1)) < 1e-9,
      "kurtosis diverged")
  }

  test("q_covar_corr agrees with covar_pop/corr built-ins per flag") {
    import org.apache.spark.sql.functions._
    val a = run(Round12gQueries.queries, "q_covar_corr").collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(4))).toMap
    val ref = graft.Tables(spark, sf0001, "lineitem")
      .groupBy("l_returnflag")
      .agg(covar_pop(col("l_discount"), col("l_extendedprice")).as("cp"),
        corr(col("l_discount"), col("l_extendedprice")).as("r"))
      .collect()
    def rel(x: Double, y: Double) = math.abs(x - y) /
      math.max(1.0, math.max(math.abs(x), math.abs(y)))
    ref.foreach { r =>
      val (cp, cr) = a(r.getString(0))
      assert(rel(cp, r.getDouble(1)) < 1e-9, s"${r.getString(0)} cov_pop")
      assert(rel(cr, r.getDouble(2)) < 1e-6, s"${r.getString(0)} corr")
    }
  }

  test("q_avg_weighted: weighted mean sits inside the value range") {
    import org.apache.spark.sql.functions._
    val rows = run(Round12gQueries.queries, "q_avg_weighted").collect()
    val rng = graft.Tables(spark, sf0001, "lineitem")
      .groupBy("l_returnflag")
      .agg(min("l_extendedprice").as("lo"), max("l_extendedprice").as("hi"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2))).toMap
    rows.foreach { r =>
      val (lo, hi) = rng(r.getString(0))
      if (!r.isNullAt(2))
        assert(r.getDouble(2) >= lo - 1e-9 && r.getDouble(2) <= hi + 1e-9,
          s"${r.getString(0)}: weighted mean outside [min, max]")
    }
  }

  // ---- 12h: ANOVA / Levene / corrMatrix / GD regression --------------

  test("q_anova_f: SSB + SSW equals total SS, F >= 0, eta^2 in [0,1]") {
    import org.apache.spark.sql.functions._
    val r = run(Round12hQueries.queries, "q_anova_f").collect().head
    val (ssb, ssw) = (r.getDouble(2), r.getDouble(3))
    assert(ssb >= -1e-6 && ssw >= -1e-6)
    // identity: SSB + SSW = Σx² − S²/N (the total sum of squares)
    val tot = graft.Tables(spark, sf0001, "lineitem")
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice").cast(
          org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("string").cast("double").as("s"),
        sum((col("l_extendedprice").cast(
            org.apache.spark.sql.types.DecimalType(18, 2)) *
          col("l_extendedprice").cast(
            org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast(org.apache.spark.sql.types.DecimalType(38, 4)))
          .cast("string").cast("double").as("ss"))
      .collect().head
    val sst = tot.getDouble(2) - tot.getDouble(1) * tot.getDouble(1) /
      tot.getLong(0).toDouble
    assert(math.abs(ssb + ssw - sst) / math.max(1.0, sst) < 1e-9,
      s"SSB+SSW=$ssb+$ssw != SST=$sst")
    if (!r.isNullAt(4)) assert(r.getDouble(4) >= 0.0)
    if (!r.isNullAt(5))
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
  }

  test("q_levene_bf: F_BF >= 0 and deviations shrink SSB+SSW vs raw") {
    val a = run(Round12hQueries.queries, "q_anova_f").collect().head
    val l = run(Round12hQueries.queries, "q_levene_bf").collect().head
    assert(l.getLong(0) == a.getLong(0) && l.getLong(1) == a.getLong(1))
    if (!l.isNullAt(4)) assert(l.getDouble(4) >= 0.0)
    // |x − median| has strictly smaller total SS than x itself here
    assert(l.getDouble(2) + l.getDouble(3) <
      a.getDouble(2) + a.getDouble(3))
  }

  test("q_corr_matrix: 6 ordered pairs, all within [-1, 1], and the " +
    "(discount, price) cell agrees with Spark's corr()") {
    import org.apache.spark.sql.functions._
    val rows = run(Round12hQueries.queries, "q_corr_matrix").collect()
    assert(rows.length == 6)
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("discount", "price"), ("discount", "quantity"),
        ("discount", "tax"), ("price", "quantity"), ("price", "tax"),
        ("quantity", "tax")))
    rows.foreach { r =>
      if (!r.isNullAt(3))
        assert(math.abs(r.getDouble(3)) <= 1.0 + 1e-12)
    }
    val ref = graft.Tables(spark, sf0001, "lineitem")
      .agg(corr(col("l_discount"), col("l_extendedprice"))).collect()
      .head.getDouble(0)
    val dp = rows.find(r => r.getString(0) == "discount" &&
      r.getString(1) == "price").get.getDouble(3)
    assert(math.abs(dp - ref) < 1e-6, s"corr(d,p) $dp vs Spark $ref")
  }

  test("q_gd_linreg: OLS is the MSE minimizer and 8 GD steps close " +
    "most of the gap from w=0") {
    val r = run(Round12hQueries.queries, "q_gd_linreg").collect().head
    val (wGd, wOls) = (r.getDouble(1), r.getDouble(3))
    val (mseGd, mseOls) = (r.getDouble(5), r.getDouble(6))
    assert(mseOls <= mseGd + 1e-6, "OLS must minimize the MSE")
    assert(math.abs(wGd - wOls) < math.abs(wOls),
      "GD after 8 steps must be closer to OLS than the w=0 start")
  }

  // ---- 12i: retention / bfloat16 quantile / RSI / MACD ---------------

  test("q_retention_conditions: monotone cohort counts, ratios in [0,1]") {
    val r = run(Round12iQueries.queries, "q_retention_conditions")
      .collect().head
    val (n, r1, r2, r3) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))
    assert(n >= r1 && r1 >= r2 && r1 >= r3,
      "retention conditions must be gated on the base condition")
    for (i <- Seq(4, 5) if !r.isNullAt(i))
      assert(r.getDouble(i) >= 0.0 && r.getDouble(i) <= 1.0)
  }

  test("q_quantile_bfloat16: truncation bound is a theorem, " +
    "quantiles ordered, truncated below exact") {
    val r = run(Round12iQueries.queries, "q_quantile_bfloat16")
      .collect().head
    assert(r.getBoolean(5), "the 2^-7 relative truncation bound MUST hold")
    assert(r.getDouble(1) <= r.getDouble(2) + 1e-12 &&
      r.getDouble(2) <= r.getDouble(3) + 1e-12, "quantiles must be ordered")
    assert(r.getDouble(1) <= r.getDouble(4) + 1e-12,
      "truncation is downward: b16 median <= exact median")
  }

  test("q_rsi_wilder: RSI in [0, 100], EMAs non-negative") {
    val rows = run(Round12iQueries.queries, "q_rsi_wilder").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(3) >= 0.0)
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 100.0,
        s"${r.getString(0)}: RSI out of range")
    }
  }

  test("q_macd_signal: macd and histogram identities hold bitwise") {
    val r = run(Round12iQueries.queries, "q_macd_signal").collect().head
    val (e12, e26, macd, sig, hist) = (r.getDouble(1), r.getDouble(2),
      r.getDouble(3), r.getDouble(4), r.getDouble(5))
    assert(macd == e12 - e26, "macd must be exactly ema12 - ema26")
    assert(hist == macd - sig, "histogram must be exactly macd - signal")
    assert(!macd.isNaN && !sig.isNaN)
  }

  test("NTZ band-join keys plan without a nested-loop join") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    for (k <- Seq("q_ntz_band_join_auto", "q_ntz_between_join_auto")) {
      val df = run(Round12aQueries.queries, k)
      val bad = graft.plans.PlanSignature.nodes(df.queryExecution.executedPlan)
        .exists {
          case _: BroadcastNestedLoopJoinExec | _: CartesianProductExec => true
          case _ => false
        }
      assert(!bad, s"$k planned a nested-loop join")
    }
  }
}
