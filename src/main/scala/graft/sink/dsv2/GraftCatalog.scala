package graft.sink.dsv2

import java.util

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** V2 catalog for clickhouse-style tables:
  *
  *   spark.sql.catalog.graft = graft.sink.dsv2.GraftCatalog
  *   spark.sql.catalog.graft.url = clickhouse://host:8123
  *   spark.sql.catalog.graft.graft.executor = memory
  *
  *   CREATE TABLE graft.t (id BIGINT, ...) PARTITIONED BY (bucket(4, id))
  *   df.writeTo("graft.t").append()
  *   spark.table("graft.t").groupBy("id").count()   // no exchange
  *
  * Two jobs beyond name resolution:
  *
  *   1. `PARTITIONED BY (bucket(n, keys))` DDL translates to the sink's
  *      hash partition strategy, so the write path clusters rows on the
  *      keys (GraftWrite.requiredDistribution) exactly as a
  *      `sink.partition-strategy=hash` option write does.
  *   2. It is a FunctionCatalog serving the `bucket` function — the
  *      piece Spark REQUIRES to resolve a scan-reported
  *      KeyGroupedPartitioning (V2ScanPartitioningAndOrdering resolves
  *      transforms only through the relation's function catalog, so
  *      path-based `format(...).load()` reads can never use the
  *      report). Catalog reads + v2 bucketing = exchange-free per-key
  *      rollups over the sharded table.
  *
  * Table metadata lives in an in-process registry (the memory
  * endpoint's catalog analog; a live ClickHouse catalog would DESCRIBE
  * TABLE server-side — same seam as the rest of the memory executor).
  */
class GraftCatalog extends TableCatalog with FunctionCatalog {

  private var catalogName: String = _
  private var defaults: Map[String, String] = Map.empty

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    defaults = options.asScala.toMap
  }

  override def name(): String = catalogName

  private def key(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString(".")

  override def listTables(namespace: Array[String]): Array[Identifier] =
    GraftCatalogRegistry.tables.keys.toArray.sorted
      .map(n => Identifier.of(namespace, n.split('.').last))

  override def loadTable(ident: Identifier): Table =
    GraftCatalogRegistry.tables.get(key(ident)) match {
      case Some(e) =>
        new GraftClickHouseTable(e.schema,
          defaults ++ e.props + ("table-name" -> ident.name()))
      case None => throw new NoSuchTableException(ident)
    }

  /** `PARTITIONED BY (bucket(n, k1, k2, …))` → hash strategy on those
    * keys (the reference's HashPartitioner as DDL); no PARTITIONED BY →
    * the table keeps whatever strategy the catalog/table properties
    * declare (balanced by default). Other transforms are rejected — an
    * identity/date partition has no sink analog.
    */
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    if (GraftCatalogRegistry.tables.contains(key(ident)))
      throw new TableAlreadyExistsException(ident)
    val partProps = partitions.toSeq match {
      case Seq() => Map.empty[String, String]
      case Seq(t) if t.name() == "bucket" =>
        val refs = t.references().map(_.fieldNames().mkString("."))
        Map("sink.partition-strategy" -> "hash",
          "sink.partition-key" -> refs.mkString(","))
      case other => throw new UnsupportedOperationException(
        s"clickhouse-style tables support PARTITIONED BY " +
          s"(bucket(n, cols…)) only, got: ${other.mkString(", ")}")
    }
    GraftCatalogRegistry.tables.put(key(ident),
      GraftCatalogRegistry.Entry(schema,
        properties.asScala.toMap - TableCatalog.PROP_EXTERNAL ++ partProps))
    loadTable(ident)
  }

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "ALTER TABLE is not supported for clickhouse-style tables")

  override def dropTable(ident: Identifier): Boolean = {
    val existed = GraftCatalogRegistry.tables.remove(key(ident)).isDefined
    if (existed) MemorySinkRegistry.clearTable(ident.name())
    existed
  }

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "RENAME TABLE is not supported for clickhouse-style tables")

  // ---- FunctionCatalog: the bucket function KeyGroupedPartitioning
  // resolution requires (loaded by Spark as Identifier([], "bucket")).

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(namespace, "bucket"))

  override def loadFunction(ident: Identifier): UnboundFunction =
    ident.name() match {
      case "bucket" => GraftBucketFunction
      case other => throw new UnsupportedOperationException(
        s"Undefined function: $other (graft catalog serves: bucket)")
    }
}

object GraftCatalogRegistry {
  case class Entry(schema: StructType, props: Map[String, String])
  val tables: TrieMap[String, Entry] = TrieMap.empty
  def clear(): Unit = tables.clear()
}

/** The catalog's `bucket(numBuckets, keys…)` — bound so Spark can
  * resolve the scan-reported KeyGroupedPartitioning transform.
  * `produceResult` reproduces the WRITE layout bit-for-bit: Spark's
  * clustered-distribution write hashes the keys with HashPartitioning
  * (murmur3 seed 42, folded across columns) and takes the positive
  * modulus, so an invocation-time bucket (storage-partitioned join
  * partial clustering) routes a row to the same bucket the writer did.
  */
object GraftBucketFunction extends UnboundFunction {

  override def name(): String = "bucket"

  override def description(): String =
    "bucket(numBuckets, keys...): murmur3-pmod shard bucket " +
      "(HashPartitioning-compatible)"

  override def bind(inputType: StructType): BoundFunction = {
    val types = inputType.fields.map(_.dataType)
    // Spark binds either (int numBuckets, keys…) — the invocation
    // shape — or just the key columns (transform resolution): accept
    // both, rejecting key types the hash doesn't cover.
    val keyTypes =
      if (types.length >= 2 && types.head == IntegerType) types.tail
      else types
    keyTypes.foreach {
      case ByteType | ShortType | IntegerType | LongType | StringType |
           DateType | BooleanType => ()
      case dt => throw new UnsupportedOperationException(
        s"bucket key type $dt is not supported " +
          "(byte/short/int/long/string/date/boolean)")
    }
    new GraftBoundBucket(types)
  }
}

class GraftBoundBucket(types: Array[DataType]) extends ScalarFunction[Integer] {

  override def inputTypes(): Array[DataType] = types

  override def resultType(): DataType = IntegerType

  override def name(): String = "bucket"

  override def canonicalName(): String = "graft.bucket"

  /** HashPartitioning fold: h = murmur3(col_i, seed = previous h),
    * starting at 42; bucket = ((h % n) + n) % n.
    */
  override def produceResult(input: InternalRow): Integer = {
    require(types.length >= 2 && types.head == IntegerType,
      "bucket invocation requires (numBuckets, keys...)")
    val n = input.getInt(0)
    var h = 42
    var i = 1
    while (i < types.length) {
      if (!input.isNullAt(i)) h = types(i) match {
        case ByteType => Murmur3_x86_32.hashInt(input.getByte(i).toInt, h)
        case ShortType => Murmur3_x86_32.hashInt(input.getShort(i).toInt, h)
        case IntegerType | DateType => Murmur3_x86_32.hashInt(input.getInt(i), h)
        case LongType => Murmur3_x86_32.hashLong(input.getLong(i), h)
        case BooleanType =>
          Murmur3_x86_32.hashInt(if (input.getBoolean(i)) 1 else 0, h)
        case StringType =>
          val s = input.getUTF8String(i)
          Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
            s.numBytes(), h)
        case dt => throw new UnsupportedOperationException(s"bucket($dt)")
      }
      i += 1
    }
    ((h % n) + n) % n
  }
}
