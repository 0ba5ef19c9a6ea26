package graft.sink

import org.apache.spark.sql.{DataFrame, Row}

import graft.operators.ChangelogOps

/** R12 upsert write path (dead code in the reference — the builder never
  * selects it — but implemented for surface completeness): each changelog
  * row is routed by kind to one of three statement batches
  * (CH/table/internal/executor/ClickHouseUpsertExecutor.java:60-79):
  *
  *   I  -> INSERT INTO t(cols) VALUES (...)
  *   +U -> ALTER TABLE t UPDATE set-cols WHERE pk-cols   (mutation)
  *   D  -> ALTER TABLE t DELETE WHERE pk-cols            (mutation)
  *   -U -> dropped
  *
  * Each route has its own buffered, retrying writer over its own
  * StatementExecutor (the reference uses three PreparedStatements flushed
  * by one async service; here each partition owns three writers flushed
  * at partition end — same delivery contract).
  */
object UpsertWriter {

  sealed trait Route
  case object InsertRoute extends Route
  case object UpdateRoute extends Route
  case object DeleteRoute extends Route

  /** The SQL statement for each route, from the user schema + PK
    * (ClickHouseExecutor.createUpsertExecutor's three statements).
    */
  def statements(options: GraftSinkOptions, fieldNames: Seq[String],
      primaryKey: Seq[String]): Map[Route, String] = Map(
    InsertRoute -> StatementFactory.insertInto(options.tableName, fieldNames),
    UpdateRoute -> StatementFactory.update(options.tableName, fieldNames,
      primaryKey, Some(options.clusterName)),
    DeleteRoute -> StatementFactory.delete(options.tableName, primaryKey,
      Some(options.clusterName)))

  def write(df: DataFrame, options: GraftSinkOptions, primaryKey: Seq[String],
      executorFactory: Route => StatementExecutor): Unit = {
    require(primaryKey.nonEmpty,
      "upsert mode requires a primary key") // R2, and UPDATE/DELETE need one
    require(df.columns.contains(ChangelogOps.OpCol),
      "upsert mode consumes a changelog (op column required)")
    val batchSize = options.batchSize
    val maxRetries = options.maxRetries
    val opIdx = df.columns.indexOf(ChangelogOps.OpCol)
    df.foreachPartition { (rows: Iterator[Row]) =>
      val writers: Map[Route, BufferedRetryWriter] =
        Seq(InsertRoute, UpdateRoute, DeleteRoute).map(r =>
          r -> new BufferedRetryWriter(executorFactory(r), batchSize,
            maxRetries)).toMap
      try {
        rows.foreach { row =>
          row.getString(opIdx) match {
            case ChangelogOps.Insert => writers(InsertRoute).write(row)
            case ChangelogOps.UpdateAfter => writers(UpdateRoute).write(row)
            case ChangelogOps.Delete => writers(DeleteRoute).write(row)
            case _ => () // -U dropped (ClickHouseUpsertExecutor.java:75-77)
          }
        }
      } finally {
        writers.values.foreach(_.close())
      }
    }
  }
}
