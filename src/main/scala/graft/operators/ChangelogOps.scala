package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Changelog→table materialization semantics, re-expressed as pure
  * DataFrame transforms.
  *
  * The reference (Rowen110/flink-connectors) is a Flink→ClickHouse sink that
  * consumes a changelog stream of RowKind-tagged rows and encodes them for
  * three ClickHouse table engines:
  *
  *  - insert-only: D / -U rows silently dropped
  *    (CH/table/internal/executor/ClickHouseBatchExecutor.java:50)
  *  - CollapsingMergeTree: a sign column, I/+U -> +1, -U/D -> -1
  *    (CH/table/internal/converter/ClickHouseRowConverter.java:71-82)
  *  - ReplacingMergeTree: a deleted flag, I/+U -> 0, -U/D -> 1; latest
  *    version per PK wins (ClickHouseRowConverter.java:83-94, README.md:20)
  *  - (dead-code) upsert executor routing I/+U/D to INSERT/UPDATE/DELETE
  *    batches (CH/table/internal/executor/ClickHouseUpsertExecutor.java:60-79)
  *
  * Spark has no RowKind, so the changelog op rides in an explicit `op`
  * string column using Flink's shorthand: "I", "-U", "+U", "D" (the same
  * convention as Delta CDF's _change_type). These functions are the
  * Spark-native equivalents of executors R9-R12 and partitioners R6-R8 in
  * SURVEY.md §2a; each is a narrow, composable transform so Catalyst sees
  * plain project/filter/aggregate nodes it can optimize through.
  */
object ChangelogOps {

  val OpCol = "op"

  /** Row kinds, mirroring org.apache.flink.types.RowKind shorthand. */
  val Insert = "I"
  val UpdateBefore = "-U"
  val UpdateAfter = "+U"
  val Delete = "D"

  /** Derive a deterministic changelog op for the synthetic `events` table
    * (which has no native row-kind column): event_id mod 4 -> I/-U/+U/D.
    * Purely a test-data adapter; real changelogs carry `op` already.
    */
  def withDerivedOp(events: DataFrame): DataFrame =
    events.withColumn(OpCol,
      when(pmod(col("event_id"), lit(4)) === 0, Insert)
        .when(pmod(col("event_id"), lit(4)) === 1, UpdateBefore)
        .when(pmod(col("event_id"), lit(4)) === 2, UpdateAfter)
        .otherwise(Delete))

  /** R9 insert-only semantics: drop DELETE and UPDATE_BEFORE rows.
    * (ClickHouseBatchExecutor.java:50 — `rowkind == INSERT || UPDATE_AFTER`.)
    */
  def ignoreDeletes(df: DataFrame): DataFrame =
    df.filter(!col(OpCol).isin(UpdateBefore, Delete))

  /** R10 CollapsingMergeTree sign column: I/+U -> +1, -U/D -> -1. */
  def withSign(df: DataFrame, signCol: String = "sign"): DataFrame =
    df.withColumn(signCol,
      when(col(OpCol).isin(Insert, UpdateAfter), lit(1)).otherwise(lit(-1)))

  /** What CollapsingMergeTree materializes at merge time: the per-key net
    * sign (0 = fully collapsed away, 1 = one live row).
    */
  def collapsingNetState(df: DataFrame, pk: Seq[String]): DataFrame =
    withSign(df).groupBy(pk.map(col): _*).agg(sum("sign").as("net"))

  /** R11 ReplacingMergeTree tombstone flag: I/+U -> 0, -U/D -> 1. */
  def withReplacingFlag(df: DataFrame, flagCol: String = "deleted"): DataFrame =
    df.withColumn(flagCol,
      when(col(OpCol).isin(Insert, UpdateAfter), lit(0)).otherwise(lit(1)))

  /** What ReplacingMergeTree materializes: highest-version row per PK,
    * dropped if its flag marks a tombstone (README.md:20). Version ties are
    * broken arbitrarily by ClickHouse; we require a total version order.
    */
  def replacingLatest(df: DataFrame, pk: Seq[String], ver: String): DataFrame = {
    val w = Window.partitionBy(pk.map(col): _*).orderBy(col(ver).desc)
    withReplacingFlag(df)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("deleted") === 0)
      .drop("__rn", "deleted")
  }

  /** R12 upsert routing: which statement batch each row would join.
    * I -> INSERT, +U -> UPDATE, D -> DELETE, -U -> dropped
    * (ClickHouseUpsertExecutor.java:60-79).
    */
  def withUpsertRoute(df: DataFrame, routeCol: String = "route"): DataFrame =
    df.withColumn(routeCol,
      when(col(OpCol) === Insert, "INSERT")
        .when(col(OpCol) === UpdateAfter, "UPDATE")
        .when(col(OpCol) === Delete, "DELETE")
        .otherwise("DROPPED"))

  /** R6 hash partitioner: shard = nonneg(hash(keys)) % n
    * (HashPartitioner.java:24 — `(hash % n + n) % n`). The reference uses
    * Java Objects.hashCode; any deterministic integer mix preserves the
    * "same key -> same shard" contract. We use a 31-weighted sum so the
    * assignment is reproducible in plain SQL for the oracle.
    */
  def withHashShard(df: DataFrame, keys: Seq[String], numShards: Int,
      shardCol: String = "shard"): DataFrame = {
    val mixed = keys.map(col).reduceLeft((a, b) => a * 31 + b)
    df.withColumn(shardCol, pmod(mixed, lit(numShards)))
  }

  /** R4 count-trigger batching: batch index of each row given arrival order
    * (ClickHouseBatchOutputFormat.java:45-52 flushes every `batch-size`).
    */
  def withBatchIndex(df: DataFrame, orderCol: String, batchSize: Int,
      batchCol: String = "batch_idx"): DataFrame = {
    val w = Window.orderBy(col(orderCol))
    df.withColumn(batchCol,
      floor((row_number().over(w) - 1) / batchSize).cast("long"))
  }
}
