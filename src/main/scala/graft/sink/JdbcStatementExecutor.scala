package graft.sink

import java.sql.{Connection, DriverManager, PreparedStatement}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

/** JDBC-backed StatementExecutor: the production endpoint of the buffered
  * writer, mirroring the reference's connection/statement lifecycle —
  * connection and prepared statement created once per task and reused
  * across batches (CH/table/internal/ClickHouseBatchOutputFormat.java:34-42,
  * ClickHouseBatchExecutor.java:42-46), positional parameter binding per
  * field with null wrapping (ClickHouseRowConverter.java:66-96).
  *
  * The URL is any JDBC URL (the reference hardcodes the ClickHouse driver;
  * keeping it generic lets the same writer target anything JDBC speaks —
  * the statement dialect comes from StatementFactory either way). Lazy
  * connect on first batch, so constructing the executor off-cluster is
  * side-effect free.
  */
class JdbcStatementExecutor(
    jdbcUrl: String,
    insertSql: String,
    schema: StructType,
    username: Option[String],
    password: Option[String]) extends StatementExecutor {

  @transient private var conn: Connection = _
  @transient private var stmt: PreparedStatement = _

  private def ensureOpen(): Unit =
    if (conn == null) {
      conn = (username, password) match {
        case (Some(u), Some(p)) => DriverManager.getConnection(jdbcUrl, u, p)
        case _ => DriverManager.getConnection(jdbcUrl)
      }
      stmt = conn.prepareStatement(insertSql)
    }

  override def executeBatch(rows: Seq[Row]): Unit = {
    ensureOpen()
    try {
      rows.foreach { row =>
        var i = 0
        while (i < schema.length) {
          TypeMapping.setField(stmt, i + 1, row, i, schema(i).dataType)
          i += 1
        }
        stmt.addBatch()
      }
      stmt.executeBatch()
      // clear on success: the JDBC spec leaves the command list's state
      // after executeBatch driver-dependent, and the retry path re-adds
      // every row — drivers that keep the list would duplicate the batch
      stmt.clearBatch()
    } catch {
      case e: Exception =>
        // the connection itself may be dead — discard both so the next
        // retry's ensureOpen() reconnects instead of reusing a broken
        // connection forever (which would defeat the retry contract)
        try { if (stmt != null) stmt.close() } catch { case _: Exception => () }
        try { if (conn != null) conn.close() } catch { case _: Exception => () }
        stmt = null
        conn = null
        throw e
    }
  }

  override def close(): Unit = {
    if (stmt != null) stmt.close()
    if (conn != null) conn.close()
  }
}

object JdbcStatementExecutor {

  /** Executor factory for ClickHouseStyleWriter.write: one executor per
    * shard partition, connected to that shard's local node when a
    * write-local topology is configured
    * (ClickHouseShardOutputFormat.java:60-70).
    */
  def factory(options: GraftSinkOptions, schema: StructType,
      fieldNames: Seq[String]): Int => StatementExecutor = { shard =>
    new JdbcStatementExecutor(
      ShardTopology.urlForShard(options, shard),
      StatementFactory.insertInto(options.tableName, fieldNames),
      schema, options.username, options.password)
  }
}
