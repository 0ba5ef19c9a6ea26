package graft.sink

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.operators.ChangelogOps

/** Batch write orchestration — the Spark-native composition of the
  * reference's sink pipeline (SURVEY.md §3 E1-E3):
  *
  *  1. changelog validation (R2): non-insert-only input requires a PK
  *  2. mode dispatch (R3) + sign/flag column injection (R10/R11) /
  *     delete-dropping (R9), done as DataFrame transforms so they run
  *     distributed and codegen'd rather than row-at-a-time in the writer
  *  3. shard routing (R5-R8) as repartitioning — Spark's shuffle replaces
  *     the reference's in-writer partitioner.select()
  *  4. per-partition buffered, count-triggered, retrying JDBC-style write
  *     (R4/R9) through the StatementExecutor seam
  *
  * A changelog DataFrame carries its row kind in an `op` column
  * ("I"/"-U"/"+U"/"D"); a DataFrame without `op` is an insert-only stream.
  */
object ClickHouseStyleWriter {

  /** Apply the mode's row transform; returns the rows to insert with any
    * sign/flag column appended (matching WriteMode.insertFieldNames order).
    */
  def prepare(df: DataFrame, options: GraftSinkOptions,
      primaryKey: Seq[String]): DataFrame = {
    val hasPk = primaryKey.nonEmpty
    val hasOp = df.columns.contains(ChangelogOps.OpCol)
    WriteMode.validateChangelog(hasPk, insertOnlyStream = !hasOp)
    val mode = WriteMode.dispatch(options, hasPk)
    // an insert-only stream (no op column) into a collapsing/replacing
    // table gets the INSERT-kind constants: sign=+1, deleted=0 — exactly
    // what the reference converter emits for RowKind.INSERT
    // (ClickHouseRowConverter.java:71-94)
    def signed(d: DataFrame): DataFrame =
      if (hasOp) ChangelogOps.withSign(d, options.collapsingField.get)
      else d.withColumn(options.collapsingField.get, lit(1))
    def flagged(d: DataFrame): DataFrame =
      if (hasOp) ChangelogOps.withReplacingFlag(d, options.replacingField.get)
      else d.withColumn(options.replacingField.get, lit(0))
    val base = mode match {
      case WriteMode.Collapsing =>
        if (options.replacingField.isDefined) // both appended, R3 :84-119
          flagged(signed(df))
        else signed(df)
      case WriteMode.Replacing =>
        flagged(df)
      case _ =>
        if (hasOp) ChangelogOps.ignoreDeletes(df) else df
    }
    if (hasOp) base.drop(ChangelogOps.OpCol) else base
  }

  /** Full write path: prepare + shard + buffered retry write. The
    * executorFactory is invoked once per shard partition on the executor
    * side (the analog of one ClickHouseExecutor per shard connection,
    * ClickHouseShardOutputFormat.java:60-70).
    */
  def write(df: DataFrame, options: GraftSinkOptions, primaryKey: Seq[String],
      numShards: Int, executorFactory: Int => StatementExecutor): Unit = {
    val prepared = prepare(df, options, primaryKey)
    val sharded =
      if (options.writeLocal) Partitioners.applyStrategy(prepared, options, numShards)
      else prepared
    val batchSize = options.batchSize
    val maxRetries = options.maxRetries
    sharded.foreachPartition { (rows: Iterator[Row]) =>
      val shard = org.apache.spark.TaskContext.getPartitionId()
      val writer = new BufferedRetryWriter(
        executorFactory(shard), batchSize, maxRetries)
      try {
        rows.foreach(writer.write)
        writer.close() // final flush — at-least-once on success path
      } catch {
        // a mid-partition flush already exhausted maxRetries: close the
        // executor WITHOUT re-flushing the still-full buffer, so the
        // original failure propagates instead of a second retry storm
        case e: Throwable =>
          try writer.closeWithoutFlush()
          catch { case suppressed: Throwable => e.addSuppressed(suppressed) }
          throw e
      }
    }
  }

  /** The insert statement this write would execute, for a given user
    * schema (field order = user fields ++ sign/flag columns).
    */
  def insertStatement(options: GraftSinkOptions, primaryKey: Seq[String],
      fieldNames: Seq[String]): String =
    StatementFactory.insertInto(options.tableName,
      WriteMode.insertFieldNames(options, primaryKey.nonEmpty, fieldNames))
}
