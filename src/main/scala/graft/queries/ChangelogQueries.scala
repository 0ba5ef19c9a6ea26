package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.ChangelogOps

/** Group A (SURVEY.md §2b): the reference's own sink semantics expressed as
  * batch queries over the `events` table, each with a DuckDB oracle.
  *
  * Changelog-op convention: `events` carries no row kind, so the op is
  * derived as event_id mod 4 -> I / -U / +U / D (ChangelogOps.withDerivedOp);
  * the oracle SQL derives it with the identical CASE so both engines see the
  * same changelog. PK surrogate = user_id, version = event_id.
  *
  * Determinism rules (SURVEY.md §5): total ORDER BY on every query, value
  * sums go through DECIMAL(18,2) so both engines sum exactly, timestamps are
  * compared as epoch millis.
  */
object ChangelogQueries {

  /** Shared op-derivation CTE for all oracle queries. */
  private val opCte =
    """WITH e AS (
      |  SELECT *, CASE CAST(event_id % 4 AS INT)
      |    WHEN 0 THEN 'I' WHEN 1 THEN '-U' WHEN 2 THEN '+U' ELSE 'D'
      |  END AS op FROM events
      |)""".stripMargin

  private def events(s: SparkSession, dir: String): DataFrame =
    ChangelogOps.withDerivedOp(Tables(s, dir, "events"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // R9: insert-only executor drops D / -U rows.
    "changelog_ignore_delete" -> ((s, dir) =>
      ChangelogOps.ignoreDeletes(events(s, dir))
        .select(col("event_id"), col("user_id"), col("op"),
          col("value"))
        .orderBy("event_id")),

    // R10: CollapsingMergeTree sign column per row.
    "collapsing_sign" -> ((s, dir) =>
      ChangelogOps.withSign(events(s, dir))
        .select(col("event_id"), col("user_id"), col("op"), col("sign"))
        .orderBy("event_id")),

    // R10 materialized: per-PK net sign after collapsing.
    "collapsing_net_state" -> ((s, dir) =>
      ChangelogOps.collapsingNetState(events(s, dir), Seq("user_id"))
        .orderBy("user_id")),

    // R11: ReplacingMergeTree tombstone flag per row.
    "replacing_flag" -> ((s, dir) =>
      ChangelogOps.withReplacingFlag(events(s, dir))
        .select(col("event_id"), col("user_id"), col("op"), col("deleted"))
        .orderBy("event_id")),

    // R11 materialized: latest version per PK, tombstones removed.
    "replacing_latest" -> ((s, dir) =>
      ChangelogOps.replacingLatest(events(s, dir), Seq("user_id"), "event_id")
        .select(col("user_id"), col("event_id"), col("op"), col("value"))
        .orderBy("user_id")),

    // R12: upsert executor statement routing, counted per route.
    "upsert_route_counts" -> ((s, dir) =>
      ChangelogOps.withUpsertRoute(events(s, dir))
        .groupBy("route").agg(count(lit(1)).as("n"))
        .orderBy("route")),

    // R6: hash partitioner shard assignment, counted per shard.
    "hash_partition_assign" -> ((s, dir) =>
      ChangelogOps.withHashShard(events(s, dir),
          Seq("user_id", "event_id"), numShards = 8)
        .groupBy("shard").agg(count(lit(1)).as("n"))
        .orderBy("shard")),

    // R4: count-trigger batching — rows per flush batch of 1000.
    "batch_count_trigger" -> ((s, dir) =>
      ChangelogOps.withBatchIndex(Tables(s, dir, "events"),
          orderCol = "event_id", batchSize = 1000)
        .groupBy("batch_idx").agg(count(lit(1)).as("n"))
        .orderBy("batch_idx")),

    // Changelog normalization (Flink's ChangelogNormalize, the operator
    // that feeds a retract stream into this sink): an upsert stream —
    // each event the next version of its key — expanded to the full
    // I / -U,+U changelog the collapsing executor consumes (R10). First
    // version emits I; every later version emits the retraction of the
    // previous value then the new one.
    "changelog_normalize" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy("user_id").orderBy("event_id")
      Tables(s, dir, "events")
        .withColumn("prev_value", lag(col("value"), 1).over(byUser))
        .select(col("user_id"), col("event_id"),
          posexplode(
            when(col("prev_value").isNull,
              array(struct(lit("I").as("op"), col("value").as("v"))))
            .otherwise(array(
              struct(lit("-U").as("op"), col("prev_value").as("v")),
              struct(lit("+U").as("op"), col("value").as("v")))))
            .as(Seq("emit_idx", "r")))
        .select(col("user_id"), col("event_id"), col("emit_idx"),
          col("r.op").as("op"), col("r.v").as("value"))
        .orderBy("user_id", "event_id", "emit_idx")
    }),
  )

  val oracle: Map[String, String] = Map(
    "changelog_ignore_delete" ->
      s"""$opCte
         |SELECT event_id, user_id, op, value FROM e
         |WHERE op NOT IN ('-U', 'D')
         |ORDER BY event_id""".stripMargin,

    "collapsing_sign" ->
      s"""$opCte
         |SELECT event_id, user_id, op,
         |  CASE WHEN op IN ('I', '+U') THEN 1 ELSE -1 END AS sign
         |FROM e ORDER BY event_id""".stripMargin,

    "collapsing_net_state" ->
      s"""$opCte
         |SELECT user_id,
         |  CAST(SUM(CASE WHEN op IN ('I', '+U') THEN 1 ELSE -1 END)
         |    AS BIGINT) AS net
         |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin,

    "replacing_flag" ->
      s"""$opCte
         |SELECT event_id, user_id, op,
         |  CASE WHEN op IN ('I', '+U') THEN 0 ELSE 1 END AS deleted
         |FROM e ORDER BY event_id""".stripMargin,

    "replacing_latest" ->
      s"""$opCte,
         |ranked AS (
         |  SELECT user_id, event_id, op, value,
         |    CASE WHEN op IN ('I', '+U') THEN 0 ELSE 1 END AS deleted,
         |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC)
         |      AS rn
         |  FROM e
         |)
         |SELECT user_id, event_id, op, value FROM ranked
         |WHERE rn = 1 AND deleted = 0
         |ORDER BY user_id""".stripMargin,

    "upsert_route_counts" ->
      s"""$opCte
         |SELECT CASE op WHEN 'I' THEN 'INSERT' WHEN '+U' THEN 'UPDATE'
         |  WHEN 'D' THEN 'DELETE' ELSE 'DROPPED' END AS route,
         |  COUNT(*) AS n
         |FROM e GROUP BY 1 ORDER BY route""".stripMargin,

    "hash_partition_assign" ->
      """SELECT CAST(((user_id * 31 + event_id) % 8 + 8) % 8 AS BIGINT)
        |  AS shard, COUNT(*) AS n
        |FROM events GROUP BY 1 ORDER BY shard""".stripMargin,

    "batch_count_trigger" ->
      """WITH b AS (
        |  SELECT CAST((ROW_NUMBER() OVER (ORDER BY event_id) - 1) // 1000
        |    AS BIGINT) AS batch_idx
        |  FROM events
        |)
        |SELECT batch_idx, COUNT(*) AS n FROM b
        |GROUP BY batch_idx ORDER BY batch_idx""".stripMargin,

    "changelog_normalize" ->
      """WITH v AS (
        |  SELECT user_id, event_id, value,
        |    LAG(value) OVER (PARTITION BY user_id ORDER BY event_id)
        |      AS prev_value
        |  FROM events
        |)
        |SELECT user_id, event_id, 0 AS emit_idx, 'I' AS op, value
        |FROM v WHERE prev_value IS NULL
        |UNION ALL
        |SELECT user_id, event_id, 0, '-U', prev_value
        |FROM v WHERE prev_value IS NOT NULL
        |UNION ALL
        |SELECT user_id, event_id, 1, '+U', value
        |FROM v WHERE prev_value IS NOT NULL
        |ORDER BY user_id, event_id, emit_idx""".stripMargin,
  )
}
