package graft.sink.dsv2

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.sink.StatementFactory

/** The DSv2 READ direction (R15 made live): write through the sink,
  * read back through format("clickhouse-style") with pruning and filter
  * pushdown reaching the generated SELECT.
  */
class Dsv2ReadSpec extends AnyFunSuite with SparkSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType)))

  private def writeSample(table: String): Unit = {
    import spark.implicits._
    (1L to 20L).map(i => (i, s"name$i", i * 1.5))
      .toDF("id", "name", "score")
      .coalesce(2).write.format("clickhouse-style")
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

  test("write-then-read roundtrip through the memory endpoint") {
    MemorySinkRegistry.clear()
    writeSample("t_rt")
    val got = readBack("t_rt").collect()
    assert(got.length == 20)
    assert(got.map(_.getLong(0)).sorted.toSeq == (1L to 20L))
    assert(got.find(_.getLong(0) == 3L).get.getString(1) == "name3")
    assert(got.find(_.getLong(0) == 4L).get.getDouble(2) == 6.0)
  }

  test("column pruning reaches the scan (ReadSchema is the projection)") {
    MemorySinkRegistry.clear()
    writeSample("t_prune")
    val df = readBack("t_prune").select("name")
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan
    }.get
    assert(scan.readSchema().fieldNames.toSeq == Seq("name"))
    assert(df.collect().map(_.getString(0)).sorted.head == "name1")
  }

  test("filters push into the scan AND stay residual (exact results)") {
    MemorySinkRegistry.clear()
    writeSample("t_filter")
    val df = readBack("t_filter").filter("id > 15 AND name != 'name16'")
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan
    }.get
    assert(scan.description().contains("`id` > 15"), scan.description())
    // residual re-application keeps semantics exact even though the
    // memory endpoint ignores pushed filters entirely
    assert(df.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(17L, 18L, 19L, 20L))
  }

  test("count(*) over the scan survives empty pruning") {
    MemorySinkRegistry.clear()
    writeSample("t_count")
    assert(readBack("t_count").count() == 20)
  }

  test("read without .schema(...) is rejected (declared, not inferred)") {
    val e = intercept[Exception] {
      spark.read.format("clickhouse-style")
        .option("url", "clickhouse://localhost:8123")
        .option("table-name", "t_noschema")
        .option("graft.executor", "memory")
        .load().collect()
    }
    assert(e.getMessage.contains("schema") ||
      e.getMessage.contains("SCHEMA"), e.getMessage)
  }

  test("select statement: pruned columns + rendered where conjuncts") {
    assert(StatementFactory.select("t", Seq("a", "b"), Seq("`a` > 5")) ==
      "SELECT `a`, `b` FROM `t` WHERE (`a` > 5)")
    assert(StatementFactory.select("t", Seq.empty, Seq.empty) ==
      "SELECT * FROM `t`")
    assert(StatementFactory.select("t", Seq("a"),
      Seq("`a` > 5", "`b` IS NULL")) ==
      "SELECT `a` FROM `t` WHERE (`a` > 5) AND (`b` IS NULL)")
  }

  test("FilterSql renders the translatable shapes, refuses the rest") {
    assert(FilterSql.render(EqualTo("a", 5)).contains("`a` = 5"))
    assert(FilterSql.render(EqualTo("a", "x'y"))
      .contains("`a` = 'x\\'y'"))
    assert(FilterSql.render(In("a", Array(1, 2)))
      .contains("`a` IN (1, 2)"))
    assert(FilterSql.render(
      And(GreaterThan("a", 1), IsNotNull("b")))
      .contains("(`a` > 1) AND (`b` IS NOT NULL)"))
    assert(FilterSql.render(StringStartsWith("s", "10%_"))
      .contains("`s` LIKE '10\\%\\_%'"))
    assert(FilterSql.render(EqualNullSafe("a", null))
      .contains("`a` IS NULL"))
    // OR with an untranslatable side must refuse the whole disjunction
    assert(FilterSql.render(
      Or(EqualTo("a", 1), EqualTo("b", Array[Byte](1)))).isEmpty)
    // boolean and decimal literals
    assert(FilterSql.render(EqualTo("f", true)).contains("`f` = 1"))
    // non-finite floats and temporal literals must stay residual —
    // pushing them could silently drop rows (NaN semantics, timezone)
    assert(FilterSql.render(EqualTo("d", Double.NaN)).isEmpty)
    assert(FilterSql.render(GreaterThan("d",
      Double.PositiveInfinity)).isEmpty)
    assert(FilterSql.render(GreaterThan("ts",
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))).isEmpty)
    assert(FilterSql.render(EqualTo("dt",
      java.sql.Date.valueOf("2024-01-01"))).isEmpty)
  }

  test("TimestampNTZ column survives the write-then-read roundtrip") {
    MemorySinkRegistry.clear()
    import spark.implicits._
    val ntzSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("t", TimestampNTZType)))
    val ldt = java.time.LocalDateTime.of(2024, 1, 2, 3, 4, 5)
    Seq((1L, ldt), (2L, ldt.plusHours(1)))
      .toDF("id", "t")
      .coalesce(1).write.format("clickhouse-style")
      .option("url", "clickhouse://localhost:8123")
      .option("table-name", "t_ntz")
      .option("graft.executor", "memory")
      .mode("append").save()
    val got = spark.read.format("clickhouse-style")
      .schema(ntzSchema)
      .option("url", "clickhouse://localhost:8123")
      .option("table-name", "t_ntz")
      .option("graft.executor", "memory")
      .load().collect()
    assert(got.length == 2)
    assert(got.map(_.getAs[java.time.LocalDateTime]("t")).toSet ==
      Set(ldt, ldt.plusHours(1)))
  }

  test("streaming read replays committed batches as micro-batches") {
    MemorySinkRegistry.clear()
    import spark.implicits._
    def writeBatch(ids: Seq[Long]): Unit =
      ids.map(i => (i, s"name$i", i * 1.5)).toDF("id", "name", "score")
        .coalesce(1).write.format("clickhouse-style")
        .option("url", "clickhouse://localhost:8123")
        .option("table-name", "t_stream")
        .option("graft.executor", "memory")
        .mode("append").save()
    writeBatch(1L to 3L)
    val q = spark.readStream.format("clickhouse-style")
      .schema(schema)
      .option("url", "clickhouse://localhost:8123")
      .option("table-name", "t_stream")
      .option("graft.executor", "memory")
      .load()
      .writeStream.format("memory").queryName("t_stream_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("t_stream_out").count() == 3)
      // rows appended AFTER stream start arrive in a later micro-batch
      writeBatch(4L to 5L)
      q.processAllAvailable()
      val got = spark.table("t_stream_out")
      assert(got.count() == 5)
      assert(got.collect().map(_.getLong(0)).sorted.toSeq == (1L to 5L))
    } finally q.stop()
  }

  test("streaming read restarts from its checkpoint without re-delivery") {
    MemorySinkRegistry.clear()
    import spark.implicits._
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_ckpt").toString
    def writeBatch(ids: Seq[Long]): Unit =
      ids.map(i => (i, s"name$i", i * 1.5)).toDF("id", "name", "score")
        .coalesce(1).write.format("clickhouse-style")
        .option("url", "clickhouse://localhost:8123")
        .option("table-name", "t_ckpt")
        .option("graft.executor", "memory")
        .mode("append").save()
    // output goes through our own DSv2 streaming sink (Spark's memory
    // sink rejects checkpoint recovery as non-fault-tolerant)
    def startStream() =
      spark.readStream.format("clickhouse-style")
        .schema(schema)
        .option("url", "clickhouse://localhost:8123")
        .option("table-name", "t_ckpt")
        .option("graft.executor", "memory")
        .load()
        .writeStream.format("clickhouse-style")
        .option("url", "clickhouse://localhost:8123")
        .option("table-name", "t_ckpt_out")
        .option("graft.executor", "memory")
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
    writeBatch(1L to 3L)
    val q1 = startStream()
    try { q1.processAllAvailable() } finally q1.stop()
    def delivered: Seq[Long] = MemorySinkRegistry.allFor("t_ckpt_out")
      .flatMap(_._2).map(_.getLong(0)).sorted
    assert(delivered == Seq(1L, 2L, 3L), delivered.mkString(", "))
    // rows appended while the stream is DOWN; the delivered set is
    // cleared so the restart's output shows exactly the delta
    MemorySinkRegistry.clearTable("t_ckpt_out")
    writeBatch(4L to 5L)
    // restart from the same checkpoint: the committed offset must
    // deserialize and only the two new rows arrive — re-delivery of
    // the first batches would show 1..5
    val q2 = startStream()
    try { q2.processAllAvailable() } finally q2.stop()
    assert(delivered == Seq(4L, 5L), delivered.mkString(", "))
  }

  test("streaming read of a jdbc endpoint fails at stream start") {
    val e = intercept[Exception] {
      val q = spark.readStream.format("clickhouse-style")
        .schema(schema)
        .option("url", "clickhouse://localhost:8123")
        .option("table-name", "t_jdbc_stream")
        .load()
        .writeStream.format("memory").queryName("t_jdbc_stream_out")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    assert(e.getMessage.contains("change cursor") ||
      Option(e.getCause).exists(_.getMessage.contains("change cursor")),
      e.toString)
  }

  test("shard-aware read plans one partition per write-local node") {
    val opts = graft.sink.GraftSinkOptions.fromMap(Map(
      "url" -> "clickhouse://coordinator:8123",
      "table-name" -> "t",
      "sink.write-local" -> "true",
      "sink.write-local-nodes" -> "n1:8123,n2:8123,n3:8123"))
    val scan = new GraftScan(opts, "jdbc", schema, schema, Array.empty)
    val parts = scan.planInputPartitions()
    assert(parts.length == 3)
    assert(parts.collect { case GraftJdbcPartition(u, _, _) => u }.distinct
      .length == 3)
  }
}
