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
  *
  * LIMITATION (inherited from the reference design): ordering across
  * routes is not preserved — a D followed by an I of the same key within
  * one flush window applies as INSERT-then-DELETE. The reference has the
  * identical behavior (three independent statement batches,
  * ClickHouseUpsertExecutor.java:60-79), and ClickHouse ALTER mutations
  * are asynchronous server-side anyway; sequenced upserts belong to the
  * replacing-mode path, where the version column totalizes order.
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

  /** Column order each route's statement binds positionally — rows handed
    * to a route's StatementExecutor are projected to exactly this shape,
    * so JdbcStatementExecutor's 1..n positional binding lines up with the
    * placeholders in [[statements]]:
    * INSERT (all columns) / UPDATE (set columns, then pk for the WHERE) /
    * DELETE (pk only).
    */
  def routeFieldNames(route: Route, fieldNames: Seq[String],
      primaryKey: Seq[String]): Seq[String] = route match {
    case InsertRoute => fieldNames
    case UpdateRoute => fieldNames.filterNot(primaryKey.contains) ++ primaryKey
    case DeleteRoute => primaryKey
  }

  def write(df: DataFrame, options: GraftSinkOptions, primaryKey: Seq[String],
      executorFactory: Route => StatementExecutor): Unit = {
    require(primaryKey.nonEmpty,
      "upsert mode requires a primary key") // R2, and UPDATE/DELETE need one
    require(df.columns.contains(ChangelogOps.OpCol),
      "upsert mode consumes a changelog (op column required)")
    val batchSize = options.batchSize
    val maxRetries = options.maxRetries
    val opIdx = df.columns.indexOf(ChangelogOps.OpCol)
    // per-route positional projections (op column never reaches a writer)
    val dataFields = df.columns.filterNot(_ == ChangelogOps.OpCol).toSeq
    val routeIdx: Map[Route, Array[Int]] =
      Seq(InsertRoute, UpdateRoute, DeleteRoute).map { r =>
        r -> routeFieldNames(r, dataFields, primaryKey)
          .map(df.columns.indexOf(_)).toArray
      }.toMap
    df.foreachPartition { (rows: Iterator[Row]) =>
      val writers: Map[Route, BufferedRetryWriter] =
        Seq(InsertRoute, UpdateRoute, DeleteRoute).map(r =>
          r -> new BufferedRetryWriter(executorFactory(r), batchSize,
            maxRetries)).toMap
      def emit(route: Route, row: Row): Unit =
        writers(route).write(
          Row.fromSeq(routeIdx(route).toIndexedSeq.map(row.get)))
      try {
        rows.foreach { row =>
          row.getString(opIdx) match {
            case ChangelogOps.Insert => emit(InsertRoute, row)
            case ChangelogOps.UpdateAfter => emit(UpdateRoute, row)
            case ChangelogOps.Delete => emit(DeleteRoute, row)
            case _ => () // -U dropped (ClickHouseUpsertExecutor.java:75-77)
          }
        }
      } finally {
        writers.values.foreach(_.close())
      }
    }
  }
}
