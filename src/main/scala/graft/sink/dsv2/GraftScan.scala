package graft.sink.dsv2

import java.sql.{DriverManager, ResultSet}

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

import graft.sink.{GraftSinkOptions, ShardTopology, StatementFactory}

/** DSv2 batch READ for the clickhouse-style source — the reference's
  * JDBC→row converter (R15, ClickHouseRowConverter.java:98-147) is dead
  * code because the connector ships no scan; this makes the read
  * direction live, Spark-first:
  *
  *   - column pruning reaches the generated SELECT (only the projected
  *     columns leave the server),
  *   - filters that render to ClickHouse-compatible SQL are pushed into
  *     the WHERE clause; ALL filters are also reported back as residual
  *     so Spark re-applies them post-scan — pushdown is a bandwidth
  *     optimization, never a correctness dependency,
  *   - one InputPartition per shard node in write-local mode (each task
  *     scans its shard-local table — the read mirror of R5), else per
  *     writer partition for the in-memory executor.
  *
  * The read schema is the PHYSICAL table layout (data columns plus any
  * appended sign/version column), supplied by the caller via
  * `.schema(...)` exactly as the write path's fixed, declared schema
  * contract (SURVEY §1: no inference).
  */
class GraftScanBuilder(options: GraftSinkOptions, executorKind: String,
    schema: StructType) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    // empty pruned schema (count(*) over the scan) keeps one column so
    // the generated SELECT stays valid and row counts are preserved
    required =
      if (requiredSchema.isEmpty) StructType(schema.fields.take(1))
      else requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(f => FilterSql.render(f).isDefined)
    filters // everything stays residual: Spark re-applies post-scan
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new GraftScan(options, executorKind, schema, required, pushed)
}

class GraftScan(options: GraftSinkOptions, executorKind: String,
    fullSchema: StructType, required: StructType, pushed: Array[Filter])
    extends Scan with Batch {

  override def readSchema(): StructType = required

  override def toBatch: Batch = this

  override def description(): String =
    s"clickhouse-style:${options.tableName} " +
      s"PushedFilters: [${pushed.flatMap(FilterSql.render).mkString(", ")}], " +
      s"ReadSchema: ${required.simpleString}"

  override def planInputPartitions(): Array[InputPartition] =
    executorKind match {
      case "memory" =>
        // one partition per writer partition id present in the registry
        val pids = MemorySinkRegistry.allFor(options.tableName)
          .map(_._1).distinct.sorted
        if (pids.isEmpty) Array(GraftMemoryPartition(options.tableName, -1))
        else pids.map(GraftMemoryPartition(options.tableName, _)).toArray
      case _ =>
        // write-local topology => scan each shard's local table in
        // parallel (the read mirror of the R5 shard writer); otherwise a
        // single coordinator scan
        val nodes =
          if (options.writeLocal) ShardTopology.resolveLive(options)
          else Seq.empty
        val urls =
          if (nodes.nonEmpty) nodes.map(_.jdbcUrl(options.databaseName))
          else Seq(options.url)
        urls.map(u => GraftJdbcPartition(u, sql)).toArray
    }

  private def sql: String = StatementFactory.select(options.tableName,
    required.fieldNames.toSeq, pushed.flatMap(FilterSql.render).toSeq)

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory(fullSchema, required,
      options.username, options.password)

  /** Streaming READ: replay the table's committed batches as
    * micro-batches — a changelog-replay source (the op column, if the
    * writer appended one, rides as data exactly as it does on the write
    * path). Memory endpoint only: a JDBC ClickHouse table has no
    * inherent change cursor, so streaming-read it through CDC
    * infrastructure instead; failing at stream start beats silently
    * re-scanning the full table every trigger.
    */
  override def toMicroBatchStream(
      checkpointLocation: String): streaming.MicroBatchStream = {
    if (executorKind != "memory")
      throw new UnsupportedOperationException(
        "clickhouse-style streaming read requires graft.executor=memory " +
          "(a JDBC table exposes no change cursor to poll)")
    new GraftMicroBatchStream(options.tableName, fullSchema, required)
  }
}

/** Offset = count of committed batches in the registry for this table.
  * Each trigger serves the batches appended since the last offset, one
  * input partition per batch — at-least-once replay in commit order.
  */
class GraftMicroBatchStream(table: String, fullSchema: StructType,
    required: StructType) extends streaming.MicroBatchStream {

  import streaming.Offset

  private case class BatchCountOffset(n: Long) extends Offset {
    override def json(): String = n.toString
  }

  override def initialOffset(): Offset = BatchCountOffset(0L)

  override def latestOffset(): Offset =
    BatchCountOffset(MemorySinkRegistry.allFor(table).size.toLong)

  override def deserializeOffset(json: String): Offset =
    BatchCountOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[BatchCountOffset].n.toInt
    val until = end.asInstanceOf[BatchCountOffset].n.toInt
    (from until until)
      .map(i => GraftStreamBatchPartition(table, i): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftStreamReaderFactory(fullSchema, required)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

case class GraftStreamBatchPartition(table: String, batchIdx: Int)
    extends InputPartition

class GraftStreamReaderFactory(fullSchema: StructType, required: StructType)
    extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[GraftStreamBatchPartition]
    new GraftBatchSliceReader(part.table, part.batchIdx, fullSchema, required)
  }
}

/** Serves exactly one committed batch (by commit-order index). */
class GraftBatchSliceReader(table: String, batchIdx: Int,
    fullSchema: StructType, required: StructType)
    extends PartitionReader[InternalRow] {

  private val project = RowProjection(fullSchema, required)
  private val rows: Iterator[Row] = {
    val batches = MemorySinkRegistry.allFor(table)
    if (batchIdx < batches.size) batches(batchIdx)._2.iterator
    else Iterator.empty
  }
  private var current: InternalRow = _

  override def next(): Boolean =
    if (!rows.hasNext) false
    else {
      current = project(rows.next())
      true
    }

  override def get(): InternalRow = current

  override def close(): Unit = ()
}

case class GraftMemoryPartition(table: String, pid: Int)
    extends InputPartition

case class GraftJdbcPartition(url: String, sql: String)
    extends InputPartition

class GraftReaderFactory(fullSchema: StructType, required: StructType,
    username: Option[String], password: Option[String])
    extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case GraftMemoryPartition(table, pid) =>
        new GraftMemoryReader(table, pid, fullSchema, required)
      case GraftJdbcPartition(url, sql) =>
        new GraftJdbcReader(url, sql, required, username, password)
    }
}

/** Shared projection of a buffered external Row (the writer's physical
  * layout) to the pruned read schema, in catalyst form. The one
  * type-shape fix-up: the writer stores TimestampNTZ values as
  * java.sql.Timestamp (GraftDataWriter.toExternalRow), but Catalyst's
  * NTZ converter accepts only java.time.LocalDateTime.
  */
private[dsv2] object RowProjection {

  def apply(fullSchema: StructType,
      required: StructType): Row => InternalRow = {
    val idx = required.fieldNames.map(fullSchema.fieldIndex)
    val isNtz = required.fields.map(_.dataType == TimestampNTZType)
    val toCatalyst =
      CatalystTypeConverters.createToCatalystConverter(required)
    r => {
      val vals = idx.zipWithIndex.map { case (srcIdx, outIdx) =>
        r.get(srcIdx) match {
          case t: java.sql.Timestamp if isNtz(outIdx) => t.toLocalDateTime
          case v => v
        }
      }
      toCatalyst(Row.fromSeq(vals.toIndexedSeq)).asInstanceOf[InternalRow]
    }
  }
}

/** Reads back the physical rows a memory-executor write buffered for one
  * writer partition, projecting to the pruned schema by field name
  * (positions resolved against the declared full schema).
  */
class GraftMemoryReader(table: String, pid: Int,
    fullSchema: StructType, required: StructType)
    extends PartitionReader[InternalRow] {

  private val project = RowProjection(fullSchema, required)
  private val rows: Iterator[Row] = MemorySinkRegistry.allFor(table)
    .filter(_._1 == pid).flatMap(_._2).iterator
  private var current: InternalRow = _

  override def next(): Boolean =
    if (!rows.hasNext) false
    else {
      current = project(rows.next())
      true
    }

  override def get(): InternalRow = current

  override def close(): Unit = ()
}

/** JDBC partition reader: executes the pushed-down SELECT and converts
  * ResultSet values for the sink's 15 supported types — the live
  * counterpart of the reference's dead toFlink deserializers
  * (ClickHouseRowConverter.java:98-147), with the same per-type getters.
  */
class GraftJdbcReader(url: String, sql: String, required: StructType,
    username: Option[String], password: Option[String])
    extends PartitionReader[InternalRow] {

  private lazy val conn = {
    val props = new java.util.Properties()
    username.foreach(props.setProperty("user", _))
    password.foreach(props.setProperty("password", _))
    DriverManager.getConnection(url, props)
  }
  // not lazy-forced in close(): a task cancelled before its first
  // next() must not execute the whole SELECT just to tear down
  private var opened = false
  private lazy val rs: ResultSet = {
    opened = true
    conn.createStatement().executeQuery(sql)
  }
  private val toCatalyst =
    CatalystTypeConverters.createToCatalystConverter(required)

  override def next(): Boolean = rs.next()

  override def get(): InternalRow = {
    val values = required.fields.zipWithIndex.map { case (f, i) =>
      val v: Any = f.dataType match {
        case BooleanType => rs.getBoolean(i + 1)
        case ByteType => rs.getByte(i + 1)
        case ShortType => rs.getShort(i + 1)
        case IntegerType => rs.getInt(i + 1)
        case LongType => rs.getLong(i + 1)
        case FloatType => rs.getFloat(i + 1)
        case DoubleType => rs.getDouble(i + 1)
        case _: DecimalType => rs.getBigDecimal(i + 1)
        case StringType => rs.getString(i + 1)
        case BinaryType => rs.getBytes(i + 1)
        case DateType => rs.getDate(i + 1)
        case TimestampType => rs.getTimestamp(i + 1)
        // Catalyst's NTZ converter accepts LocalDateTime only — a
        // java.sql.Timestamp here would throw at conversion time
        case TimestampNTZType =>
          Option(rs.getTimestamp(i + 1)).map(_.toLocalDateTime).orNull
        case dt => throw new UnsupportedOperationException(
          s"Unsupported read type $dt") // same contract as the writer
      }
      if (rs.wasNull()) null else v
    }
    toCatalyst(Row.fromSeq(values.toIndexedSeq)).asInstanceOf[InternalRow]
  }

  override def close(): Unit = if (opened) {
    try rs.close() catch { case _: Throwable => () }
    try conn.close() catch { case _: Throwable => () }
  }
}

/** Renders Spark data-source filters to ClickHouse-compatible SQL; None
  * for shapes that don't translate (they stay Spark-side residuals).
  */
object FilterSql {

  private def q(attr: String): String =
    StatementFactory.quoteIdentifier(attr)

  private def lit(v: Any): Option[String] = v match {
    case null => None // null literals only appear via IsNull/IsNotNull
    case s: String => Some("'" + s.replace("\\", "\\\\")
      .replace("'", "\\'") + "'")
    case b: Boolean => Some(if (b) "1" else "0")
    // non-finite floats don't push: 'Infinity' is not a SQL literal,
    // and SQL `x = NaN` is false where Spark's NaN semantics match
    case f: Float if java.lang.Float.isFinite(f) => Some(f.toString)
    case d: Double if java.lang.Double.isFinite(d) => Some(d.toString)
    case n @ (_: Byte | _: Short | _: Int | _: Long) => Some(n.toString)
    case d: java.math.BigDecimal => Some(d.toPlainString)
    case d: BigDecimal => Some(d.underlying.toPlainString)
    // Date/Timestamp literals stay residual: java.sql.Timestamp
    // renders in the JVM default timezone and the server would parse
    // it in ITS timezone — a pushed predicate could silently drop rows
    // the residual cannot restore, breaking the bandwidth-only contract
    case _ => None // temporals/arrays/structs/binary don't push
  }

  /** LIKE-pattern escape for the _ and % metacharacters. */
  private def likeEsc(s: String): String =
    s.replace("\\", "\\\\").replace("'", "\\'")
      .replace("_", "\\_").replace("%", "\\%")

  def render(f: Filter): Option[String] = f match {
    case EqualTo(a, v) => lit(v).map(l => s"${q(a)} = $l")
    case EqualNullSafe(a, null) => Some(s"${q(a)} IS NULL")
    case EqualNullSafe(a, v) => lit(v).map(l => s"${q(a)} = $l")
    case GreaterThan(a, v) => lit(v).map(l => s"${q(a)} > $l")
    case GreaterThanOrEqual(a, v) => lit(v).map(l => s"${q(a)} >= $l")
    case LessThan(a, v) => lit(v).map(l => s"${q(a)} < $l")
    case LessThanOrEqual(a, v) => lit(v).map(l => s"${q(a)} <= $l")
    case In(a, vs) if vs.nonEmpty =>
      val ls = vs.toSeq.map(lit)
      if (ls.forall(_.isDefined))
        Some(s"${q(a)} IN (${ls.flatten.mkString(", ")})")
      else None
    case IsNull(a) => Some(s"${q(a)} IS NULL")
    case IsNotNull(a) => Some(s"${q(a)} IS NOT NULL")
    case And(l, r) =>
      for (ls <- render(l); rs <- render(r)) yield s"($ls) AND ($rs)"
    case Or(l, r) =>
      for (ls <- render(l); rs <- render(r)) yield s"($ls) OR ($rs)"
    case Not(c) => render(c).map(s => s"NOT ($s)")
    case StringStartsWith(a, v) => Some(s"${q(a)} LIKE '${likeEsc(v)}%'")
    case StringEndsWith(a, v) => Some(s"${q(a)} LIKE '%${likeEsc(v)}'")
    case StringContains(a, v) => Some(s"${q(a)} LIKE '%${likeEsc(v)}%'")
    case _ => None
  }
}
