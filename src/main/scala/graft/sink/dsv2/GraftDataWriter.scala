package graft.sink.dsv2

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, DataWriterFactory, WriterCommitMessage}
import org.apache.spark.sql.types._

import graft.sink._

/** Per-partition DSv2 writer: InternalRow -> external Row conversion, then
  * the same BufferedRetryWriter hot path as the foreachPartition route
  * (one writer + one executor per partition, count-trigger flush, retry,
  * final flush on commit — ClickHouseBatchOutputFormat.java:44-79).
  */
class GraftDataWriterFactory(options: GraftSinkOptions, pk: Seq[String],
    executorKind: String, schema: StructType) extends DataWriterFactory {

  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] = {
    val fieldNames = schema.fieldNames.toSeq
    val executor: StatementExecutor = executorKind match {
      case "memory" => new MemorySinkRegistry.Exec(partitionId)
      case _ => new JdbcStatementExecutor(
        options.url,
        StatementFactory.insertInto(options.tableName, fieldNames),
        schema, options.username, options.password)
    }
    new GraftDataWriter(
      new BufferedRetryWriter(executor, options.batchSize, options.maxRetries),
      schema)
  }
}

class GraftDataWriter(writer: BufferedRetryWriter, schema: StructType)
    extends DataWriter[InternalRow] {

  override def write(record: InternalRow): Unit =
    writer.write(GraftDataWriter.toExternalRow(record, schema))

  override def commit(): WriterCommitMessage = {
    writer.flush()
    new WriterCommitMessage {}
  }

  override def abort(): Unit = ()

  override def close(): Unit = writer.close()
}

object GraftDataWriter {

  /** InternalRow -> external Row for the sink's 15 supported types (the
    * same set as TypeMapping; SURVEY.md §1 internal-encoding table).
    */
  def toExternalRow(ir: InternalRow, schema: StructType): Row = {
    val values = schema.fields.zipWithIndex.map { case (f, i) =>
      if (ir.isNullAt(i)) null
      else f.dataType match {
        case StringType => ir.getUTF8String(i).toString
        case dt: DecimalType =>
          ir.getDecimal(i, dt.precision, dt.scale).toJavaBigDecimal
        case DateType => // int epoch-day, converter :130
          java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(ir.getInt(i)))
        case TimestampType | TimestampNTZType => // long epoch-micros
          java.sql.Timestamp.from(
            java.time.Instant.EPOCH.plusNanos(ir.getLong(i) * 1000L))
        case BinaryType => ir.getBinary(i)
        case dt => ir.get(i, dt) // primitives pass through
      }
    }
    Row.fromSeq(values.toIndexedSeq)
  }
}

/** Static in-memory sink target for the DSv2 path — the offline analog of
  * a ClickHouse endpoint (same seam as unit-test executors, but reachable
  * through a plain `.format("clickhouse-style")` write).
  */
object MemorySinkRegistry {
  val batches = new ConcurrentLinkedQueue[(Int, Seq[Row])]()
  def clear(): Unit = batches.clear()
  def all: Seq[(Int, Seq[Row])] = {
    import scala.jdk.CollectionConverters._
    batches.asScala.toSeq
  }

  class Exec(partition: Int) extends StatementExecutor {
    override def executeBatch(rows: Seq[Row]): Unit =
      batches.add((partition, rows))
  }
}
