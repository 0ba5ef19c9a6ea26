package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Group D (round 2): relational depth beyond the §2b contract — the
  * temporal/merge patterns a changelog-fed warehouse needs (as-of
  * enrichment, gaps-and-islands sessionization, SCD-2 history, snapshot
  * MERGE classification) plus the remaining SQL surface (FILTER-style
  * conditional aggregates, arg_max/arg_min, bit aggregates, ordered
  * string_agg, posexplode, rank-selected discrete quantiles) and a
  * salted-join skew demo.
  *
  * Scale posture notes are on each query; the as-of join is the
  * single-shuffle union+window formulation (no per-row subquery, no
  * pair explosion), which is the shape that survives 100 TB.
  *
  * Determinism: same conventions as the other groups — total ORDER BY
  * mirrored in the oracle, DECIMAL(18,2) routing for double sums
  * (events.value is 2-decimal), timestamps as epoch micros, and every
  * window ordered by a provably unique key (event_id / o_orderkey).
  */
object AdvancedQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  private def dsum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // As-of join: each click enriched with the latest purchase (same
    // user) at-or-before its timestamp. Implemented as ONE union + ONE
    // window — both streams shuffle once on user_id, then a running
    // last(ignoreNulls) carries the most recent purchase forward. No
    // per-left-row probe, no range-join pair explosion; at 100 TB this
    // is a single sort-merge pass per key, the same shape as a
    // stream-stream temporal join. Purchases sort before clicks on
    // timestamp ties (side 0 < 1) for inclusive <= semantics; event_id
    // makes the sort total. The oracle is DuckDB's native ASOF JOIN —
    // an independent implementation of the same semantics.
    "q_asof_join" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .withColumn("us", unix_micros(col("ts")))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("us"), lit(1).as("side"),
          col("event_id"), col("value").as("click_value"),
          lit(null).cast("double").as("p_value"),
          lit(null).cast("long").as("p_us"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("us"), lit(0).as("side"),
          col("event_id"), lit(null).cast("double").as("click_value"),
          col("value").as("p_value"), col("us").as("p_us"))
      val w = Window.partitionBy("user_id")
        .orderBy("us", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      clicks.unionByName(purchases)
        .withColumn("last_purchase_value",
          last(col("p_value"), ignoreNulls = true).over(w))
        .withColumn("last_purchase_us",
          last(col("p_us"), ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .select(col("user_id"), col("event_id"), col("us").as("click_us"),
          col("click_value"), col("last_purchase_value"),
          col("last_purchase_us"))
        .orderBy("user_id", "event_id")
    }),

    // Gaps & islands: maximal runs of the same event_type per user in
    // time order — the classic rn-difference grouping. One shuffle on
    // user_id; both window passes reuse the same sort.
    "q_gap_islands" -> ((s, dir) => {
      val byUser = Window.partitionBy("user_id")
        .orderBy("us", "event_id")
      val byUserType = Window.partitionBy("user_id", "event_type")
        .orderBy("us", "event_id")
      t(s, dir, "events")
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("grp",
          row_number().over(byUser) - row_number().over(byUserType))
        .groupBy("user_id", "event_type", "grp")
        .agg(count(lit(1)).as("run_len"))
        .groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n_islands"),
          max(col("run_len")).as("max_run"))
        .orderBy("user_id", "event_type")
    }),

    // SCD-2 effective ranges from the changelog: each event-version of a
    // user becomes a [valid_from, valid_to) row, closed by the next
    // version (lead), open-ended for the current one — the history table
    // a ReplacingMergeTree collapses to latest (R11) but keeps in full
    // here. Single shuffle on the PK.
    "q_scd2_ranges" -> ((s, dir) => {
      val byUser = Window.partitionBy("user_id").orderBy("event_id")
      t(s, dir, "events")
        .withColumn("valid_from_us", unix_micros(col("ts")))
        .withColumn("valid_to_us",
          lead(col("valid_from_us"), 1).over(byUser))
        .withColumn("is_current",
          col("valid_to_us").isNull.cast("int"))
        .select("user_id", "event_id", "value", "valid_from_us",
          "valid_to_us", "is_current")
        .orderBy("user_id", "event_id")
    }),

    // MERGE-style snapshot diff: latest order per customer in two date
    // halves, full-outer-joined and classified insert/update/delete —
    // the batch materialization of the upsert executor's routing (R12).
    // arg_max keyed by the unique o_orderkey keeps it deterministic.
    "q_merge_diff" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val cut = lit("1998-01-01").cast("timestamp")
      def snap(df: DataFrame) = df.groupBy("o_custkey")
        .agg(max_by(col("o_totalprice"), col("o_orderkey")).as("price"),
          max(col("o_orderkey")).as("last_key"))
      val old = snap(o.filter(col("o_orderdate") < cut))
        .select(col("o_custkey").as("custkey"),
          col("price").as("old_price"), col("last_key").as("old_key"))
      val neu = snap(o.filter(col("o_orderdate") >= cut))
        .select(col("o_custkey").as("custkey"),
          col("price").as("new_price"), col("last_key").as("new_key"))
      old.join(neu, Seq("custkey"), "full_outer")
        .withColumn("action",
          when(col("old_key").isNull, "insert")
            .when(col("new_key").isNull, "delete")
            .otherwise("update"))
        .select("custkey", "action", "old_price", "new_price")
        .orderBy("custkey")
    }),

    // FILTER-clause conditional aggregation (count_if / filtered sums).
    "q_conditional_agg" -> ((s, dir) => {
      val high = col("value") > 100
      t(s, dir, "events")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_total"),
          sum(when(high, 1L).otherwise(0L)).as("n_high"),
          dsum(when(high, col("value"))).as("sum_high"),
          (sum(when(high, 1).otherwise(0)).cast("double") / count(lit(1)))
            .as("high_share"))
        .orderBy("event_type")
    }),

    // arg_max / arg_min: value carried by the extremal version key —
    // deterministic because event_id is unique per group.
    "q_min_max_by" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy("user_id")
        // NULL-valued rows are excluded from the arg extremes by
        // nulling their ORDERING key (Spark's min_by/max_by skip null
        // keys) — DuckDB's arg_min/arg_max skip NULL arguments natively,
        // and the two defaults diverge on a NULL-valued first event
        .agg(max_by(col("value"),
          when(col("value").isNotNull, col("event_id"))).as("latest_value"),
          min_by(col("value"),
            when(col("value").isNotNull, col("event_id"))).as("first_value"),
          max(col("value")).as("max_value"),
          min(col("value")).as("min_value"))
        .orderBy("user_id")),

    // Bitwise aggregates over the version column (shard-mask style).
    "q_bitwise_agg" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy("user_id")
        .agg(expr("bit_and(event_id)").as("band"),
          expr("bit_or(event_id)").as("bor"),
          expr("bit_xor(event_id)").as("bxor"),
          count(lit(1)).as("n"))
        .orderBy("user_id")),

    // Ordered string aggregation: csv of distinct user ids per type.
    // Sorted BEFORE concatenation on both engines (array_sort here,
    // ORDER BY inside string_agg there) so the result is total-ordered.
    "q_string_agg" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy("event_type")
        .agg(concat_ws(",",
          transform(array_sort(collect_set(col("user_id"))),
            _.cast("string"))).as("users"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("event_type")),

    // Table-generating explode with position (LATERAL/UNNEST surface) —
    // first 5 tokens of each document, position-tagged.
    "q_posexplode" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(slice(split(col("text"), " "), 1, 5))
            .as(Seq("pos", "tok")))
        .orderBy("doc_id", "pos")),

    // Discrete quantiles by rank selection: the value AT position
    // ceil(q*n) of the (value, event_id) total order — engine-agnostic
    // (no interpolation, no percentile built-ins), single window pass.
    "q_quantile_disc" -> ((s, dir) => {
      val w = Window.partitionBy("event_type").orderBy("value", "event_id")
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy("event_type")))
        .groupBy("event_type")
        .agg(
          max(when(col("rn") === expr("(n + 3) div 4"),
            col("value"))).as("p25"),
          max(when(col("rn") === expr("(n + 1) div 2"),
            col("value"))).as("p50"),
          max(when(col("rn") === expr("(n * 3 + 3) div 4"),
            col("value"))).as("p75"),
          max(col("n")).as("n"))
        .orderBy("event_type")
    }),

    // Salted skew JOIN: events.user_id has ~15 distinct values — at
    // 100 TB each key is a multi-GB straggler in a plain shuffle join.
    // Replicate the tiny dim across 16 salt buckets and split each hot
    // key 16 ways; the join key becomes (user_id, salt) and every
    // bucket is 1/16th of a hot key. Oracle = the plain unsalted join.
    "q_salted_join" -> ((s, dir) => {
      val salts = 16
      val dim = t(s, dir, "events").select(col("user_id")).distinct()
        .withColumn("tier", pmod(col("user_id"), lit(3)))
        .crossJoin(broadcast(
          s.range(salts).select(col("id").cast("int").as("salt"))))
      val facts = t(s, dir, "events")
        .withColumn("salt", pmod(col("event_id"), lit(salts)).cast("int"))
      facts.join(dim, Seq("user_id", "salt"))
        .groupBy("tier")
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy("tier")
    }),

    // Centered/trailing ROWS-frame moving average (3 rows) — the frame
    // variant q_window_running_sum/q_window_range_frame don't cover.
    "q_moving_avg" -> ((s, dir) => {
      val d = DecimalType(18, 2)
      val w = Window.partitionBy("user_id")
        .orderBy("us", "event_id").rowsBetween(-2, 0)
      t(s, dir, "events")
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("mavg3",
          (sum(col("value").cast(d)).over(w).cast("double") /
            count(lit(1)).over(w)))
        .select("user_id", "event_id", "value", "mavg3")
        .orderBy("user_id", "event_id")
    }),

    // Year-over-year revenue delta: yearly aggregate + lag — the
    // two-level (aggregate, then window over aggregates) shape.
    "q_yoy_revenue" -> ((s, dir) => {
      val w = Window.orderBy("yr")
      t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("yr"))
        .agg(dsum(col("o_totalprice")).as("revenue"),
          count(lit(1)).as("n_orders"))
        .withColumn("prev_revenue", lag(col("revenue"), 1).over(w))
        .withColumn("yoy_delta", col("revenue") - col("prev_revenue"))
        .orderBy("yr")
    }),

    // Fixed-width value histogram — the profile/telemetry shape.
    "q_histogram" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(floor(col("value") / 50).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("value")).as("lo"), max(col("value")).as("hi"))
        .orderBy("bucket")),

    // EXISTS / NOT IN written as SQL subqueries (the textual surface a
    // Flink SQL job would use; Catalyst rewrites both to semi/anti
    // joins — same plans as q_semi_join/q_anti_join, different syntax).
    "q_exists_subquery" -> ((s, dir) => {
      Seq("customer", "orders").foreach(n =>
        t(s, dir, n).createOrReplaceTempView(s"${n}_v"))
      s.sql("""
        SELECT c_custkey, c_name FROM customer_v
        WHERE EXISTS (SELECT 1 FROM orders_v
                      WHERE o_custkey = c_custkey
                        AND o_totalprice > 400000)
          AND c_custkey NOT IN (SELECT o_custkey FROM orders_v
                                WHERE o_orderstatus = 'P')
        ORDER BY c_custkey""")
    }),

    // Explicit shuffle-hash join hint: for two large same-key tables
    // where sort-merge's sort is pure overhead and neither side
    // broadcasts — the third join strategy, requested explicitly.
    "q_shuffle_hash_join" -> ((s, dir) =>
      t(s, dir, "orders").hint("shuffle_hash")
        .join(t(s, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy("o_orderstatus")),

    // Higher-order array functions over token arrays: lambda filter /
    // transform / exists / aggregate — the codegen-friendly surface that
    // replaces per-row UDFs.
    "q_higher_order_funcs" -> ((s, dir) => {
      val ws = split(col("text"), " ")
      // interpreted lambda folds are per-row CPU: spread the single-file
      // scan across the cluster first (PipelineQueries.spread rationale)
      PipelineQueries.spread(s, t(s, dir, "documents"))
        .select(col("doc_id"),
          size(filter(ws, w => length(w) > 5)).as("n_long_tokens"),
          array_max(transform(ws, w => length(w))).as("max_token_len"),
          exists(ws, _ === "spark").cast("int").as("mentions_spark"),
          aggregate(transform(ws, w => length(w)), lit(0),
            (acc, x) => acc + x).as("total_token_chars"))
        .orderBy("doc_id")
    }),

    // Correlated LATERAL subquery with LIMIT: top-2 orders per customer
    // without a window function — the per-row table-subquery surface.
    "q_lateral_topn" -> ((s, dir) => {
      Seq("customer", "orders").foreach(n =>
        t(s, dir, n).createOrReplaceTempView(s"${n}_lv"))
      s.sql("""
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM customer_lv c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders_lv
                 WHERE o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        ORDER BY c.c_custkey, o.o_orderkey""")
    }),

    // Null-safe equality join (<=> / IS NOT DISTINCT FROM): user 0
    // mapped to NULL on both sides still joins — the semantic the
    // changelog PK join needs when keys carry explicit nulls.
    "q_null_safe_join" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .withColumn("k", when(col("user_id") === 0, lit(null).cast("long"))
          .otherwise(col("user_id")))
      val dim = e.select(col("k")).distinct()
        .withColumn("tier", coalesce(pmod(col("k"), lit(3)), lit(-1L)))
      e.join(dim, e("k") <=> dim("k"))
        .groupBy("tier")
        .agg(count(lit(1)).as("n"))
        .orderBy("tier")
    }),

    // Interval join (the batch form of Flink's stream-stream interval
    // join, the canonical upstream of the reference sink): purchases
    // within the 10 minutes before each click, same user. Equi-join on
    // the user key with the time band as a residual predicate — pairs
    // are bounded per key by the interval width, so the join output is
    // linear in input at any scale (unlike an unkeyed range join).
    "q_interval_join" -> ((s, dir) => {
      val e = t(s, dir, "events").withColumn("us", unix_micros(col("ts")))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("us").as("c_us"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("us").as("p_us"),
          col("value").as("p_value"))
      val win = 10L * 60 * 1000000 // 10 min in micros
      // the band lives IN the join condition: out-of-band pairs are
      // rejected during the join, so output stays linear (a click with
      // no in-band purchase survives as a single null-padded row)
      clicks.join(purchases,
          clicks("user_id") === purchases("user_id") &&
          col("p_us") <= col("c_us") && col("p_us") > col("c_us") - win,
          "left")
        .groupBy(clicks("user_id"), col("event_id"))
        .agg(count(col("p_us")).as("n_purchases_10m"),
          dsum(col("p_value")).as("sum_purchases_10m"))
        .orderBy("user_id", "event_id")
    }),

    // nth_value and IGNORE NULLS analytics: 3rd event value per user
    // (running frame) and the first purchase value seen so far — the
    // null-skipping window surface.
    "q_window_nth" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("pv",
          when(col("event_type") === "purchase", col("value")))
        .withColumn("third_value", nth_value(col("value"), 3).over(w))
        .withColumn("first_purchase",
          first(col("pv"), ignoreNulls = true).over(w))
        .select("user_id", "event_id", "value", "third_value",
          "first_purchase")
        .orderBy("user_id", "event_id")
    }),

    // TPC-H Q5 shape (local supplier volume): the 6-table join with the
    // extra co-nationality condition between customer and supplier —
    // the deepest join tree in the suite; all dims broadcast, the fact
    // table streams through once.
    "q_tpch_q5" -> ((s, dir) => {
      val d = DecimalType(18, 2)
      val lo = lit("1996-01-01").cast("timestamp")
      val hi = lit("1998-01-01").cast("timestamp")
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders")
            .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey") &&
          col("r_name") === "ASIA")
        .groupBy("n_name")
        .agg(sum(col("l_extendedprice").cast(d) *
            (lit(1).cast(d) - col("l_discount").cast(d)))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // TPC-H Q18 shape (large-volume customers): semi-join against a
    // HAVING-filtered aggregate subquery, then re-aggregate.
    "q_tpch_q18" -> ((s, dir) => {
      val big = t(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).as("sumq"))
        .filter(col("sumq") > 150)
        .select("l_orderkey")
      t(s, dir, "orders")
        .join(big, col("o_orderkey") === big("l_orderkey"), "left_semi")
        .join(broadcast(t(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .join(t(s, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey")
        .agg(dsum(col("l_quantity")).as("total_qty"),
          max(col("o_totalprice")).as("o_totalprice"))
        .orderBy(col("total_qty").desc, col("o_orderkey"))
        .limit(20)
    }),

    // TPC-H Q3 shape (shipping priority): selective dim filter broadcast
    // into a two-join star, revenue agg, global top-10. The canonical
    // "analytics dashboard" feed: only the filtered customer keys and
    // (orderkey, partial revenue) rows ever cross a shuffle.
    "q_tpch_q3" -> ((s, dir) => {
      val d = DecimalType(18, 2)
      val cut = lit("1998-01-01").cast("timestamp")
      val cust = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val ord = t(s, dir, "orders").filter(col("o_orderdate") < cut)
      val li = t(s, dir, "lineitem").filter(col("l_shipdate") > cut)
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(sum(col("l_extendedprice").cast(d) *
            (lit(1).cast(d) - col("l_discount").cast(d)))
          .cast("double").as("revenue"))
        .select(col("l_orderkey"),
          // parquet timestamp[ms] reads as NTZ; session TZ is UTC so the
          // cast is an identity relabel before the epoch conversion
          unix_millis(col("o_orderdate").cast("timestamp"))
            .as("o_orderdate_ms"),
          col("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q10 shape (returned items): revenue lost to returns per
    // customer over a quarter-window, nation broadcast, top-20.
    "q_tpch_q10" -> ((s, dir) => {
      val d = DecimalType(18, 2)
      val lo = lit("1997-01-01").cast("timestamp")
      val hi = lit("1998-01-01").cast("timestamp")
      t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .join(t(s, dir, "orders")
            .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(sum(col("l_extendedprice").cast(d) *
            (lit(1).cast(d) - col("l_discount").cast(d)))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),
  )

  val oracle: Map[String, String] = Map(

    // Independent formulation: DuckDB's native ASOF JOIN (inclusive >=,
    // greatest purchase ts <= click ts) — validated tie-free at every
    // scale factor ((user_id, epoch_us) is unique within events).
    "q_asof_join" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type, value
        |  FROM events
        |),
        |clicks AS (SELECT * FROM e WHERE event_type = 'click'),
        |purch  AS (SELECT * FROM e WHERE event_type = 'purchase')
        |SELECT c.user_id, c.event_id, c.us AS click_us,
        |  c.value AS click_value,
        |  p.value AS last_purchase_value,
        |  p.us AS last_purchase_us
        |FROM clicks c ASOF LEFT JOIN purch p
        |  ON c.user_id = p.user_id AND c.us >= p.us
        |ORDER BY c.user_id, c.event_id""".stripMargin,

    "q_gap_islands" ->
      """WITH g AS (
        |  SELECT user_id, event_type,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id)
        |    - ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |      ORDER BY epoch_us(ts), event_id) AS grp
        |  FROM events
        |), runs AS (
        |  SELECT user_id, event_type, grp, COUNT(*) AS run_len
        |  FROM g GROUP BY 1, 2, 3
        |)
        |SELECT user_id, event_type, COUNT(*) AS n_islands,
        |  MAX(run_len) AS max_run
        |FROM runs GROUP BY 1, 2
        |ORDER BY user_id, event_type""".stripMargin,

    "q_scd2_ranges" ->
      """SELECT user_id, event_id, value,
        |  epoch_us(ts) AS valid_from_us,
        |  LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id)
        |    AS valid_to_us,
        |  CAST(LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
        |    ORDER BY event_id) IS NULL AS INT) AS is_current
        |FROM events
        |ORDER BY user_id, event_id""".stripMargin,

    "q_merge_diff" ->
      """WITH old AS (
        |  SELECT o_custkey AS custkey,
        |    arg_max(o_totalprice, o_orderkey) AS old_price,
        |    MAX(o_orderkey) AS old_key
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
        |  GROUP BY 1
        |), neu AS (
        |  SELECT o_custkey AS custkey,
        |    arg_max(o_totalprice, o_orderkey) AS new_price,
        |    MAX(o_orderkey) AS new_key
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
        |  GROUP BY 1
        |)
        |SELECT COALESCE(o.custkey, n.custkey) AS custkey,
        |  CASE WHEN o.old_key IS NULL THEN 'insert'
        |       WHEN n.new_key IS NULL THEN 'delete'
        |       ELSE 'update' END AS action,
        |  o.old_price, n.new_price
        |FROM old o FULL OUTER JOIN neu n ON o.custkey = n.custkey
        |ORDER BY custkey""".stripMargin,

    "q_conditional_agg" ->
      """SELECT event_type, COUNT(*) AS n_total,
        |  CAST(COUNT(*) FILTER (WHERE value > 100) AS BIGINT) AS n_high,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2)))
        |    FILTER (WHERE value > 100) AS DOUBLE) AS sum_high,
        |  CAST(COUNT(*) FILTER (WHERE value > 100) AS DOUBLE) / COUNT(*)
        |    AS high_share
        |FROM events GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q_min_max_by" ->
      """SELECT user_id,
        |  arg_max(value, event_id) AS latest_value,
        |  arg_min(value, event_id) AS first_value,
        |  MAX(value) AS max_value, MIN(value) AS min_value
        |FROM events GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    "q_bitwise_agg" ->
      """SELECT user_id, bit_and(event_id) AS band,
        |  bit_or(event_id) AS bor, bit_xor(event_id) AS bxor,
        |  COUNT(*) AS n
        |FROM events GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    "q_string_agg" ->
      """WITH d AS (SELECT DISTINCT event_type, user_id FROM events)
        |SELECT event_type,
        |  string_agg(CAST(user_id AS VARCHAR), ',' ORDER BY user_id)
        |    AS users,
        |  COUNT(*) AS n_users
        |FROM d GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q_posexplode" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ')[1:5] AS toks
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CAST(generate_subscripts(toks, 1) - 1 AS INT) AS pos,
        |  unnest(toks) AS tok
        |FROM w
        |ORDER BY doc_id, pos""".stripMargin,

    "q_quantile_disc" ->
      """WITH r AS (
        |  SELECT event_type, value, event_id,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY value, event_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n
        |  FROM events
        |)
        |SELECT event_type,
        |  MAX(CASE WHEN rn = (n + 3) // 4 THEN value END) AS p25,
        |  MAX(CASE WHEN rn = (n + 1) // 2 THEN value END) AS p50,
        |  MAX(CASE WHEN rn = (n * 3 + 3) // 4 THEN value END) AS p75,
        |  MAX(n) AS n
        |FROM r GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q_salted_join" ->
      """WITH dim AS (
        |  SELECT DISTINCT user_id, user_id % 3 AS tier FROM events
        |)
        |SELECT d.tier, COUNT(*) AS n,
        |  CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events e JOIN dim d ON e.user_id = d.user_id
        |GROUP BY d.tier
        |ORDER BY d.tier""".stripMargin,

    "q_moving_avg" ->
      """SELECT user_id, event_id, value,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |    / COUNT(*) OVER w AS mavg3
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,

    "q_yoy_revenue" ->
      """WITH y AS (
        |  SELECT CAST(year(o_orderdate) AS INT) AS yr,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |      AS revenue,
        |    COUNT(*) AS n_orders
        |  FROM orders GROUP BY 1
        |)
        |SELECT yr, revenue, n_orders,
        |  LAG(revenue) OVER (ORDER BY yr) AS prev_revenue,
        |  revenue - LAG(revenue) OVER (ORDER BY yr) AS yoy_delta
        |FROM y ORDER BY yr""".stripMargin,

    "q_histogram" ->
      """SELECT CAST(FLOOR(value / 50) AS BIGINT) AS bucket,
        |  COUNT(*) AS n, MIN(value) AS lo, MAX(value) AS hi
        |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q_exists_subquery" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey
        |                AND o_totalprice > 400000)
        |  AND c_custkey NOT IN (SELECT o_custkey FROM orders
        |                        WHERE o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,

    "q_shuffle_hash_join" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_price
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    "q_higher_order_funcs" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
        |           FROM documents)
        |SELECT doc_id,
        |  CAST(len(list_filter(ws, w -> length(w) > 5)) AS INT)
        |    AS n_long_tokens,
        |  CAST(list_max(list_transform(ws, w -> length(w))) AS INT)
        |    AS max_token_len,
        |  CAST(list_contains(ws, 'spark') AS INT) AS mentions_spark,
        |  CAST(list_sum(list_transform(ws, w -> length(w))) AS INT)
        |    AS total_token_chars
        |FROM w
        |ORDER BY doc_id""".stripMargin,

    "q_lateral_topn" ->
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        |FROM customer c,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
        |         WHERE o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        |ORDER BY c.c_custkey, o.o_orderkey""".stripMargin,

    "q_null_safe_join" ->
      """WITH e AS (
        |  SELECT CASE WHEN user_id = 0 THEN NULL ELSE user_id END AS k
        |  FROM events
        |),
        |dim AS (
        |  SELECT k, COALESCE(k % 3, -1) AS tier FROM (SELECT DISTINCT k FROM e)
        |)
        |SELECT d.tier, COUNT(*) AS n
        |FROM e JOIN dim d ON e.k IS NOT DISTINCT FROM d.k
        |GROUP BY d.tier
        |ORDER BY d.tier""".stripMargin,

    "q_interval_join" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type, value
        |  FROM events
        |),
        |c AS (SELECT user_id, event_id, us AS c_us FROM e
        |      WHERE event_type = 'click'),
        |p AS (SELECT user_id, us AS p_us, value AS p_value FROM e
        |      WHERE event_type = 'purchase')
        |SELECT c.user_id, c.event_id,
        |  COUNT(p.p_us) AS n_purchases_10m,
        |  CAST(SUM(CAST(p.p_value AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_purchases_10m
        |FROM c LEFT JOIN p ON c.user_id = p.user_id
        |  AND p.p_us <= c.c_us AND p.p_us > c.c_us - 600000000
        |GROUP BY c.user_id, c.event_id
        |ORDER BY c.user_id, c.event_id""".stripMargin,

    "q_window_nth" ->
      """SELECT user_id, event_id, value,
        |  nth_value(value, 3) OVER w AS third_value,
        |  first_value(CASE WHEN event_type = 'purchase' THEN value END
        |    IGNORE NULLS) OVER w AS first_purchase
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,

    "q_tpch_q5" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |    AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |  AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "q_tpch_q18" ->
      """WITH big AS (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
        |)
        |SELECT c_custkey, c_name, o_orderkey,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_qty,
        |  MAX(o_totalprice) AS o_totalprice
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (SELECT l_orderkey FROM big)
        |GROUP BY c_custkey, c_name, o_orderkey
        |ORDER BY total_qty DESC, o_orderkey
        |LIMIT 20""".stripMargin,

    "q_tpch_q3" ->
      """SELECT l_orderkey, epoch_ms(o_orderdate) AS o_orderdate_ms,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |    AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,

    "q_tpch_q10" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |    AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,
  )
}
