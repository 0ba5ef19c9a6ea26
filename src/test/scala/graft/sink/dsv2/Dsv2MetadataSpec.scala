package graft.sink.dsv2

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.sink.GraftSinkOptions

/** SupportsMetadataColumns: the virtual `_shard` column on the read
  * path — writer partition id (memory) / shard index (jdbc), selected
  * on demand and absent otherwise.
  */
class Dsv2MetadataSpec extends AnyFunSuite with SparkSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType)))

  private def writeSample(table: String): Unit = {
    import spark.implicits._
    (1L to 20L).map(i => (i, s"name$i"))
      .toDF("id", "name")
      .repartition(4, org.apache.spark.sql.functions.col("id"))
      .write.format("clickhouse-style")
      .option("url", "clickhouse://localhost:8123")
      .option("table-name", table)
      .option("graft.executor", "memory")
      .mode("append").save()
  }

  private def readBack(table: String) =
    spark.read.format("clickhouse-style")
      .schema(schema)
      .option("url", "clickhouse://localhost:8123")
      .option("table-name", table)
      .option("graft.executor", "memory")
      .load()

  test("_shard is selectable and equals the writer partition id") {
    MemorySinkRegistry.clear()
    writeSample("t_meta")
    val got = readBack("t_meta").select("id", "_shard").collect()
    assert(got.length == 20)
    // ground truth from the registry: pid -> ids buffered there
    val truth = MemorySinkRegistry.allFor("t_meta")
      .flatMap { case (pid, rows) => rows.map(r => r.getLong(0) -> pid) }
      .toMap
    got.foreach { r =>
      assert(r.getInt(1) == truth(r.getLong(0)),
        s"id=${r.getLong(0)} reported shard ${r.getInt(1)}")
    }
    // 4 writer partitions were used
    assert(got.map(_.getInt(1)).distinct.sorted.length == 4)
  }

  test("_shard is absent from the scan unless selected") {
    MemorySinkRegistry.clear()
    writeSample("t_meta_abs")
    val df = readBack("t_meta_abs").select("name")
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan
    }.get
    assert(!scan.readSchema().fieldNames.contains("_shard"))
    assert(df.collect().length == 20)
  }

  test("filtering on _shard stays reader-side and is exact") {
    MemorySinkRegistry.clear()
    writeSample("t_meta_filter")
    val all = readBack("t_meta_filter").select("id", "_shard").collect()
    val wantPid = all.map(_.getInt(1)).min
    val expected = all.filter(_.getInt(1) == wantPid).map(_.getLong(0)).sorted
    val df = readBack("t_meta_filter")
      .filter(org.apache.spark.sql.functions.col("_shard") === wantPid)
      .select("id")
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == expected.toSeq)
  }

  test("jdbc SELECT carries data columns only, never _shard") {
    val opts = GraftSinkOptions.fromMap(Map(
      "url" -> "clickhouse://localhost:8123",
      "table-name" -> "t_srv"))
    val required = StructType(Seq(
      StructField("id", LongType),
      StructField("_shard", IntegerType, nullable = false)))
    val scan = new GraftScan(opts, "jdbc", schema, required,
      pushed = Array.empty)
    assert(scan.sql == "SELECT `id` FROM `t_srv`", scan.sql)
  }

  test("jdbc-path runtime V2 filtering: join-derived _shard IN (...) " +
      "never reaches the server WHERE (ADVICE r5 / r6 #7)") {
    import org.apache.spark.sql.connector.expressions.{
      Expression => V2Expr, Expressions, Literal => V2Literal}
    import org.apache.spark.sql.connector.expressions.filter.{Predicate => V2Predicate}
    // Spark's own LiteralValue is private[sql]; speak the public contract
    case class Lit[T](value: T, dataType: DataType) extends V2Literal[T]
    val opts = GraftSinkOptions.fromMap(Map(
      "url" -> "clickhouse://localhost:8123",
      "table-name" -> "t_rt"))
    val required = StructType(Seq(
      StructField("id", LongType),
      StructField("_shard", IntegerType, nullable = false)))
    val scan = new GraftScan(opts, "jdbc", schema, required,
      pushed = Array.empty)
    // _shard is reader-side only: a join-derived `_shard IN (...)`
    // rendered into the server WHERE is an unknown-column error
    assert(!scan.filterAttributes().map(_.describe()).contains("_shard"))
    scan.filter(Array(
      new V2Predicate("IN", Array[V2Expr](Expressions.column("_shard"),
        Lit(0, IntegerType))),
      new V2Predicate("IN", Array[V2Expr](Expressions.column("id"),
        Lit(7L, LongType)))))
    assert(scan.sql == "SELECT `id` FROM `t_rt` WHERE (`id` IN (7))",
      scan.sql)
    // belt-and-braces: the rendered server statement mentions _shard
    // nowhere — not in SELECT, not in WHERE
    assert(!scan.sql.contains("_shard"), scan.sql)
  }

  test("a declared _shard DATA column takes precedence over the metadata column") {
    // SupportsMetadataColumns convention: a schema that legitimately
    // contains _shard must read it as data — no constant substitution,
    // no server-SELECT stripping, no metadata advertisement
    val dataSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("_shard", IntegerType)))
    assert(!GraftMetadata.shardIsMetadata(dataSchema))
    assert(GraftMetadata.shardIsMetadata(schema))
    val opts = GraftSinkOptions.fromMap(Map(
      "url" -> "clickhouse://localhost:8123",
      "table-name" -> "t_conflict"))
    val scan = new GraftScan(opts, "jdbc", dataSchema, dataSchema,
      pushed = Array.empty)
    assert(scan.sql == "SELECT `id`, `_shard` FROM `t_conflict`", scan.sql)
    assert(scan.filterAttributes().map(_.describe()).contains("_shard"))
    // and the table stops advertising the metadata column entirely
    val props = Map("url" -> "clickhouse://localhost:8123",
      "table-name" -> "t_conflict")
    val table = new GraftClickHouseTable(dataSchema, props)
    assert(table.metadataColumns().isEmpty)
    val metaTable = new GraftClickHouseTable(schema, props)
    assert(metaTable.metadataColumns().map(_.name()).toSeq == Seq("_shard"))
  }

  test("streaming read serves _shard as the replayed batch's writer pid") {
    MemorySinkRegistry.clear()
    writeSample("t_meta_stream")
    val required = StructType(Seq(
      StructField("id", LongType),
      StructField("_shard", IntegerType, nullable = false)))
    val batches = MemorySinkRegistry.allFor("t_meta_stream")
    assert(batches.nonEmpty)
    val got = (0 until batches.size).flatMap { i =>
      val r = new GraftBatchSliceReader("t_meta_stream", i, schema, required)
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
      while (r.next()) {
        val row = r.get()
        buf += ((row.getLong(0), row.getInt(1)))
      }
      buf
    }
    val truth = batches
      .flatMap { case (pid, rows) => rows.map(r => r.getLong(0) -> pid) }
      .toMap
    assert(got.size == 20)
    got.foreach { case (id, sh) => assert(sh == truth(id), s"id=$id") }
  }
}
