package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-9 first batch: ClickHouse aggregate-combinator semantics.
  * The reference is a ClickHouse sink (SURVEY §0); the queries its
  * users feed it are written against ClickHouse's behavioral-analytics
  * aggregates. This batch re-expresses the three canonical ones as
  * Spark-native plans:
  *
  *  - q_window_funnel: windowFunnel(1h)(view -> click -> purchase) per
  *    user, greedy from the user's FIRST view (each later step must
  *    fall within the window of that anchor): the level histogram.
  *    Three conditional aggregations chained by user_id-keyed joins —
  *    all three resolve in one co-partitioning at scale, like
  *    q_funnel_steps, but with the time-window cap that distinguishes
  *    windowFunnel from a plain funnel (CH docs: windowFunnel).
  *  - q_sequence_count_vc: sequenceCount('v .* c') — non-overlapping
  *    view-then-click matches per user, counted with one
  *    regexp_extract_all over the canonical per-user letter sequence
  *    (sort_array fixes collect_list's nondeterministic order; the
  *    pattern 'v[^c]*c' is RE2-safe and scans left-to-right
  *    non-overlapping identically in Java regex and DuckDB's RE2).
  *  - q_summap_pivot: sumMap(hour -> value) per event type — the
  *    per-key map sum materialized as parallel sorted arrays
  *    (hours[], sums[]). Inner groupBy(type, hour) is 5x24 groups;
  *    the array assembly aggregates 24 rows per type, never the scan.
  */
object Round9aQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    graft.Tables(s, dir, n)

  private val dec = DecimalType(18, 2)

  private val letter =
    when(col("event_type") === "view", "v")
      .when(col("event_type") === "click", "c")
      .when(col("event_type") === "purchase", "p")
      .when(col("event_type") === "signup", "s")
      .when(col("event_type") === "error", "e")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_window_funnel" -> ((s, dir) => {
      val WindowUs = 3600L * 1000000L // 1 hour
      val ev = graft.CacheScope.retain(t(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us")))
      // anchor: first view per user; each later step within anchor+1h
      val s1 = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("us")).as("t1"))
      val s2 = ev.filter(col("event_type") === "click").as("e")
        .join(s1.as("f"), col("e.user_id") === col("f.user_id"))
        .filter(col("e.us") > col("f.t1") &&
          col("e.us") <= col("f.t1") + lit(WindowUs))
        .groupBy(col("f.user_id").as("user_id"), col("f.t1").as("t1"))
        .agg(min(col("e.us")).as("t2"))
      val s3 = ev.filter(col("event_type") === "purchase").as("e")
        .join(s2.as("f"), col("e.user_id") === col("f.user_id"))
        .filter(col("e.us") > col("f.t2") &&
          col("e.us") <= col("f.t1") + lit(WindowUs))
        .groupBy(col("f.user_id").as("user_id")).agg(min(col("e.us")).as("t3"))
      val levels = ev.select("user_id").distinct()
        .join(s1.select(col("user_id"), lit(1).as("l1")), Seq("user_id"), "left")
        .join(s2.select(col("user_id"), lit(1).as("l2")), Seq("user_id"), "left")
        .join(s3.select(col("user_id"), lit(1).as("l3")), Seq("user_id"), "left")
        .select(coalesce(col("l3") + 2, col("l2") + 1, col("l1"), lit(0))
          .as("level"))
      levels.groupBy("level").agg(count(lit(1)).as("n_users"))
        .orderBy("level")
    }),

    "q_sequence_count_vc" -> ((s, dir) => {
      val seqs = t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), letter.as("l"))
        .groupBy("user_id")
        .agg(array_join(transform(
          sort_array(collect_list(
            struct(col("ts"), col("event_id"), col("l")))),
          x => x.getField("l")), "").as("seq"))
        .select(col("user_id"),
          size(regexp_extract_all(col("seq"), lit("v[^c]*c"), lit(0)))
            .as("n_vc"),
          size(regexp_extract_all(col("seq"), lit("e+"), lit(0)))
            .as("n_error_runs"))
      seqs.agg(
        count(lit(1)).as("n_users"),
        sum(col("n_vc").cast("long")).as("total_vc_matches"),
        sum(when(col("n_vc") > 0, 1L).otherwise(0L)).as("users_with_vc"),
        max(col("n_vc").cast("long")).as("max_vc_per_user"),
        sum(col("n_error_runs").cast("long")).as("total_error_runs"))
    }),

    "q_summap_pivot" -> ((s, dir) => {
      val hourly = t(s, dir, "events")
        // long hour: the oracle checker's integer-width tolerance does
        // not reach inside list elements, and DuckDB's hour() is BIGINT
        .select(col("event_type"), hour(col("ts")).cast("long").as("h"),
          col("value").cast(dec).as("v"))
        .groupBy("event_type", "h")
        // decimal -> string -> double: correctly rounded on both
        // engines (DuckDB's direct decimal cast can sit 1 ulp off —
        // the CORRECTNESS_sf0001 class)
        .agg(sum(col("v")).cast("string").cast("double").as("hv"))
      hourly.groupBy("event_type")
        .agg(sort_array(collect_list(struct(col("h"), col("hv"))))
          .as("kv"))
        .select(col("event_type"),
          transform(col("kv"), x => x.getField("h")).as("hours"),
          transform(col("kv"), x => x.getField("hv")).as("sums"),
          size(col("kv")).as("n_hours"))
        .orderBy("event_type")
    }))

  val oracle: Map[String, String] = Map(

    "q_window_funnel" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
        |), s1 AS (
        |  SELECT user_id, MIN(us) AS t1 FROM ev
        |  WHERE event_type = 'view' GROUP BY user_id
        |), s2 AS (
        |  SELECT e.user_id, f.t1, MIN(e.us) AS t2
        |  FROM ev e JOIN s1 f ON e.user_id = f.user_id
        |  WHERE e.event_type = 'click' AND e.us > f.t1
        |    AND e.us <= f.t1 + 3600000000
        |  GROUP BY e.user_id, f.t1
        |), s3 AS (
        |  SELECT e.user_id, MIN(e.us) AS t3
        |  FROM ev e JOIN s2 f ON e.user_id = f.user_id
        |  WHERE e.event_type = 'purchase' AND e.us > f.t2
        |    AND e.us <= f.t1 + 3600000000
        |  GROUP BY e.user_id
        |)
        |SELECT level, CAST(COUNT(*) AS BIGINT) AS n_users FROM (
        |  SELECT COALESCE(
        |    CASE WHEN s3.user_id IS NOT NULL THEN 3 END,
        |    CASE WHEN s2.user_id IS NOT NULL THEN 2 END,
        |    CASE WHEN s1.user_id IS NOT NULL THEN 1 END, 0) AS level
        |  FROM (SELECT DISTINCT user_id FROM ev) u
        |  LEFT JOIN s1 USING (user_id)
        |  LEFT JOIN s2 USING (user_id)
        |  LEFT JOIN s3 USING (user_id)
        |) GROUP BY level ORDER BY level""".stripMargin,

    "q_sequence_count_vc" ->
      """WITH seqs AS (
        |  SELECT user_id,
        |    string_agg(CASE event_type WHEN 'view' THEN 'v'
        |      WHEN 'click' THEN 'c' WHEN 'purchase' THEN 'p'
        |      WHEN 'signup' THEN 's' WHEN 'error' THEN 'e' END, ''
        |      ORDER BY ts, event_id) AS seq
        |  FROM events GROUP BY user_id
        |), counted AS (
        |  SELECT user_id,
        |    length(regexp_extract_all(seq, 'v[^c]*c')) AS n_vc,
        |    length(regexp_extract_all(seq, 'e+')) AS n_error_runs
        |  FROM seqs
        |)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(SUM(n_vc) AS BIGINT) AS total_vc_matches,
        |  CAST(SUM(CASE WHEN n_vc > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS users_with_vc,
        |  CAST(MAX(n_vc) AS BIGINT) AS max_vc_per_user,
        |  CAST(SUM(n_error_runs) AS BIGINT) AS total_error_runs
        |FROM counted""".stripMargin,

    "q_summap_pivot" ->
      """WITH hourly AS (
        |  SELECT event_type, hour(ts) AS h,
        |    CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR)
        |      AS DOUBLE) AS hv
        |  FROM events GROUP BY event_type, hour(ts)
        |)
        |SELECT event_type,
        |  list(h ORDER BY h) AS hours,
        |  list(hv ORDER BY h) AS sums,
        |  CAST(COUNT(*) AS INTEGER) AS n_hours
        |FROM hourly GROUP BY event_type ORDER BY event_type""".stripMargin)
}
