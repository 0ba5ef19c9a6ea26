package graft.sink.dsv2

import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sink.GraftSinkOptions

/** SQL UPDATE / MERGE INTO for clickhouse-style tables, via Spark's
  * group-based (copy-on-write) row-level operation protocol:
  *
  *   UPDATE graft.t SET score = score * 2 WHERE id <= 5
  *   MERGE INTO graft.t USING src ON t.id = src.id
  *     WHEN MATCHED THEN UPDATE SET …
  *     WHEN NOT MATCHED THEN INSERT *
  *
  * The operation's scan reads the affected groups (this sink exposes
  * the whole table as one group — it has no partition-level metadata
  * to narrow the rewrite), Spark computes the full post-image rows,
  * and the replacement write lands in a STAGING table that swaps in
  * atomically at commit — the scan and the write touch the same
  * buffered table, so writing in place would consume the rows the
  * rewrite is still reading. DELETE keeps its metadata fast path
  * (SupportsDelete) and only falls back here for filters the mutation
  * gate refuses.
  *
  * Memory endpoint only: a JDBC ClickHouse table updates through ALTER
  * mutations, not a read-rewrite-replace cycle — refusing at plan time
  * beats a full-table rewrite over JDBC.
  */
class GraftRowLevelOperation(cmd: RowLevelOperation.Command,
    schema: StructType, properties: Map[String, String])
    extends RowLevelOperation {

  private val executorKind = properties.getOrElse("graft.executor", "jdbc")
  private def opts: GraftSinkOptions =
    GraftSinkOptions.fromMap(properties - "primary-key" - "graft.executor")

  override def command(): RowLevelOperation.Command = cmd

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(opts, executorKind, schema)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    if (executorKind != "memory")
      throw new UnsupportedOperationException(
        s"$cmd on a JDBC clickhouse-style table is not supported: " +
          "row-level rewrite would replace the whole table over JDBC; " +
          "use the sink's changelog modes (collapsing/replacing) or " +
          "server-side ALTER mutations instead")
    new WriteBuilder {
      override def build(): Write = new GraftStagedReplaceWrite(
        opts, info.schema())
    }
  }
}

/** Replacement write for row-level operations: tasks append the
  * post-image rows to `<table>__rlo_staging`; commit swaps the staging
  * rows in for the real table in one registry operation (abort just
  * drops the staging) — the closest an in-memory endpoint gets to the
  * atomic-replace contract group-based rewrites assume.
  */
class GraftStagedReplaceWrite(options: GraftSinkOptions,
    schema: StructType) extends Write {

  private val staging = options.tableName + "__rlo_staging"

  override def toBatch: BatchWrite = new BatchWrite {

    override def createBatchWriterFactory(
        info: PhysicalWriteInfo): DataWriterFactory = {
      MemorySinkRegistry.clearTable(staging) // stale rows from an abort
      new OperationColumnDroppingFactory(
        new GraftDataWriterFactory(options.copy(tableName = staging),
          pk = Seq.empty, executorKind = "memory", schema = schema),
        schema)
    }

    override def commit(messages: Array[WriterCommitMessage]): Unit =
      MemorySinkRegistry.swap(staging, options.tableName)

    override def abort(messages: Array[WriterCommitMessage]): Unit =
      MemorySinkRegistry.clearTable(staging)
  }
}

/** Spark's group-based rewrite tags every post-image row with a leading
  * `__row_operation` column, and `ReplaceDataExec.writingTask` only
  * projects it away when the operation declared METADATA columns (the
  * no-metadata branch falls back to the plain non-projecting
  * DataWritingSparkTask, Spark 4.1) — while LogicalWriteInfo.schema()
  * reports the bare table schema. This wrapper restores the declared
  * contract: when a row arrives one field wider than the schema, the
  * leading operation column is dropped before the sink writer reads it.
  */
class OperationColumnDroppingFactory(
    inner: org.apache.spark.sql.connector.write.DataWriterFactory,
    schema: StructType)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.connector.write.{DataWriter, WriterCommitMessage}

  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] = {
    val delegate = inner.createWriter(partitionId, taskId)
    val types = schema.fields.map(_.dataType)
    new DataWriter[InternalRow] {
      override def write(record: InternalRow): Unit = {
        val projected =
          if (record.numFields == types.length + 1) {
            val vals = new Array[Any](types.length)
            var i = 0
            while (i < types.length) {
              vals(i) =
                if (record.isNullAt(i + 1)) null
                else record.get(i + 1, types(i))
              i += 1
            }
            new org.apache.spark.sql.catalyst.expressions
              .GenericInternalRow(vals)
          } else record
        delegate.write(projected)
      }
      override def commit(): WriterCommitMessage = delegate.commit()
      override def abort(): Unit = delegate.abort()
      override def close(): Unit = delegate.close()
    }
  }
}
