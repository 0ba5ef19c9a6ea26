package graft.sink.dsv2

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.sink.GraftSinkOptions

/** Aggregate / limit / top-N pushdown on the DSv2 read path. The memory
  * endpoint exercises the partial-aggregation readers end-to-end; the
  * JDBC SQL generation is pinned at the Scan level (no server needed).
  */
class Dsv2PushdownSpec extends AnyFunSuite with SparkSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("grp", StringType),
    StructField("score", DoubleType)))

  private def writeSample(table: String): Unit = {
    import spark.implicits._
    (1L to 20L).map(i => (i, s"g${i % 3}", i * 1.5))
      .toDF("id", "grp", "score")
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

  private def scanOf(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan
    }.get

  test("grouped aggregate pushes down and stays exact") {
    MemorySinkRegistry.clear()
    writeSample("t_agg")
    val df = readBack("t_agg").groupBy("grp")
      .agg(count(lit(1)).as("n"), max("score").as("mx"),
        sum("id").as("s"))
    val scan = scanOf(df)
    assert(scan.description().contains("PushedAggregates"),
      scan.description())
    assert(scan.description().contains("PushedGroupBy: [grp]"))
    // partial push: the scan returns group/agg columns, Spark merges
    assert(scan.readSchema().fields.head.name == "grp")
    val got = df.collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3))))
      .toMap
    // 20 ids over grp = id%3: g0={3..18 step3}=6, g1={1..19}=7, g2=7
    assert(got("g0") == ((6L, 27.0, 3L + 6 + 9 + 12 + 15 + 18)))
    assert(got("g1")._1 == 7L && got("g2")._1 == 7L)
    assert(got("g1")._2 == 28.5) // max score in g1 = 19*1.5
  }

  test("global aggregate (no grouping) pushes down and stays exact") {
    MemorySinkRegistry.clear()
    writeSample("t_gagg")
    val df = readBack("t_gagg")
      .agg(count(lit(1)).as("n"), min("id").as("lo"), max("id").as("hi"))
    val scan = scanOf(df)
    assert(scan.description().contains("PushedAggregates"),
      scan.description())
    val r = df.collect().head
    assert(r.getLong(0) == 20L && r.getLong(1) == 1L && r.getLong(2) == 20L)
  }

  test("aggregate does NOT push when a filter stays residual") {
    MemorySinkRegistry.clear()
    writeSample("t_aggf")
    val df = readBack("t_aggf").filter("id > 5").groupBy("grp").count()
    val scan = scanOf(df)
    // every filter is residual by contract, so Spark must keep the
    // aggregation its side — and results stay exact
    assert(!scan.description().contains("PushedAggregates"),
      scan.description())
    assert(df.collect().map(_.getLong(1)).sum == 15L)
  }

  test("limit pushes per-partition and the global limit still applies") {
    MemorySinkRegistry.clear()
    writeSample("t_lim")
    val df = readBack("t_lim").limit(3)
    val scan = scanOf(df)
    assert(scan.description().contains("PushedLimit: 3"),
      scan.description())
    assert(df.collect().length == 3)
  }

  test("count(distinct) stays Spark-side (not translatable)") {
    MemorySinkRegistry.clear()
    writeSample("t_dist")
    val df = readBack("t_dist").groupBy("grp")
      .agg(countDistinct("score").as("d"))
    assert(!scanOf(df).description().contains("PushedAggregates"))
    assert(df.collect().map(_.getLong(1)).sum == 20L)
  }

  test("offset refuses multi-partition scans; results stay exact") {
    MemorySinkRegistry.clear()
    writeSample("t_off")
    val df = readBack("t_off").orderBy("id").offset(5).limit(3)
    // the memory endpoint is multi-partition: a per-partition offset
    // would drop too many rows, so the builder must refuse the push
    assert(!scanOf(df).description().contains("PushedOffset"),
      scanOf(df).description())
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(6L, 7L, 8L))
  }

  test("offset renders on the single-coordinator JDBC SQL") {
    val opts = GraftSinkOptions.fromMap(Map(
      "url" -> "clickhouse://host:8123", "table-name" -> "t"))
    val scan = new GraftScan(opts, "jdbc", schema,
      StructType(schema.fields.take(1)), Array.empty, None, Some(10),
      Seq(OrderSpec("id", asc = true, nullsFirst = true)), Some(20))
    assert(scan.sql.endsWith(
      "ORDER BY `id` ASC NULLS FIRST LIMIT 10 OFFSET 20"), scan.sql)
  }

  test("JDBC scan SQL renders aggregate, top-N and limit") {
    val opts = GraftSinkOptions.fromMap(Map(
      "url" -> "clickhouse://host:8123", "table-name" -> "t"))
    val aggScan = new GraftScan(opts, "jdbc", schema, schema,
      Array.empty,
      Some(PushedAgg(
        Seq(schema("grp")),
        Seq(AggSpec("count", None, LongType),
          AggSpec("sum", Some("id"), LongType),
          AggSpec("min", Some("score"), DoubleType)))))
    assert(aggScan.sql ==
      "SELECT `grp`, count(*), sum(`id`), min(`score`) FROM `t` GROUP BY `grp`")
    val topScan = new GraftScan(opts, "jdbc", schema,
      StructType(schema.fields.take(2)), Array.empty, None, Some(5),
      Seq(OrderSpec("score", asc = false, nullsFirst = false)))
    assert(topScan.sql.endsWith(
      "ORDER BY `score` DESC NULLS LAST LIMIT 5"), topScan.sql)
  }

  // --- SupportsRuntimeV2Filtering: join-derived predicates narrow the
  // generated SELECT (bandwidth-only; skipped shapes stay a superset) ---

  import org.apache.spark.sql.connector.expressions.{Expression => V2Expr,
    Expressions, Literal => V2Literal}
  import org.apache.spark.sql.connector.expressions.filter.{Predicate => V2Predicate}
  import org.apache.spark.unsafe.types.UTF8String

  /** Spark's own LiteralValue is private[sql]; runtime predicates reach
    * the scan through the public Literal interface, so the test speaks
    * the same contract.
    */
  private case class Lit[T](value: T, dataType: DataType)
      extends V2Literal[T]

  private def jdbcScan(pushed: Array[org.apache.spark.sql.sources.Filter] =
      Array.empty) = {
    val opts = GraftSinkOptions.fromMap(Map(
      "url" -> "clickhouse://host:8123", "table-name" -> "t"))
    new GraftScan(opts, "jdbc", schema, schema, pushed)
  }

  test("runtime IN filter narrows the JDBC SQL next to static pushdown") {
    val scan = jdbcScan(
      Array(org.apache.spark.sql.sources.GreaterThan("score", 1.5)))
    assert(scan.filterAttributes().map(_.describe()).toSeq ==
      Seq("id", "grp", "score"))
    scan.filter(Array(new V2Predicate("IN", Array[V2Expr](
      Expressions.column("id"),
      Lit(1L, LongType), Lit(3L, LongType)))))
    assert(scan.sql.contains("`id` IN (1, 3)"), scan.sql)
    assert(scan.sql.contains("`score` > 1.5"), scan.sql)
    assert(scan.description().contains(
      "PushedRuntimeFilters: [`id` IN (1, 3)]"), scan.description())
  }

  test("runtime filters render strings/equality/boolean algebra") {
    val scan = jdbcScan()
    val eqGrp = new V2Predicate("=", Array[V2Expr](
      Expressions.column("grp"),
      Lit(UTF8String.fromString("g'1"), StringType)))
    val gtId = new V2Predicate(">", Array[V2Expr](
      Expressions.column("id"), Lit(7L, LongType)))
    scan.filter(Array(new V2Predicate("AND", Array[V2Expr](eqGrp, gtId))))
    assert(scan.sql.contains("(`grp` = 'g\\'1') AND (`id` > 7)"), scan.sql)
  }

  test("unrenderable runtime predicates are skipped, not fatal") {
    val scan = jdbcScan()
    // temporal literals don't render (timezone hazard), nested column
    // references don't resolve — both must be dropped silently
    scan.filter(Array(
      new V2Predicate("IN", Array[V2Expr](
        Expressions.column("id"), Lit(0L, TimestampType))),
      new V2Predicate("=", Array[V2Expr](
        Expressions.column("nested.field"), Lit(1L, LongType)))))
    assert(!scan.sql.contains("WHERE"), scan.sql)
    assert(!scan.description().contains("PushedRuntimeFilters"))
  }
}
