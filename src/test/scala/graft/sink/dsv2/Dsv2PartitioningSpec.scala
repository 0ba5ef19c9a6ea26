package graft.sink.dsv2

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Catalog-routed storage-partitioned reads: CREATE TABLE … PARTITIONED
  * BY (bucket(n, key)) makes the write cluster rows on the key
  * (GraftWrite.requiredDistribution), the scan reports the layout as
  * KeyGroupedPartitioning, the catalog's FunctionCatalog resolves the
  * bucket transform, and under spark.sql.sources.v2.bucketing.enabled a
  * groupBy on the key plans with NO shuffle exchange. Also pins the
  * boundary: path-based format(...).load() reads have no function
  * catalog, so they keep their shuffle even with the same options.
  */
class Dsv2PartitioningSpec extends AnyFunSuite with SparkSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType)))

  private def configureCatalog(): Unit = {
    spark.conf.set("spark.sql.catalog.graft",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.url",
      "clickhouse://localhost:8123")
    spark.conf.set("spark.sql.catalog.graft.graft.executor", "memory")
  }

  private def createAndFill(table: String, bucketed: Boolean): Unit = {
    import spark.implicits._
    configureCatalog()
    val part = if (bucketed) "PARTITIONED BY (bucket(4, id))" else ""
    spark.sql(s"CREATE TABLE graft.$table " +
      "(id BIGINT, name STRING, score DOUBLE) " + part)
    (1L to 40L).map(i => (i % 7, s"name$i", i * 1.5))
      .toDF("id", "name", "score")
      .coalesce(2).writeTo(s"graft.$table").append()
  }

  private def withBucketing[A](f: => A): A = {
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try f
    finally spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
  }

  private def shuffles(df: DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case s: ShuffleExchangeExec => s
    }.size

  private val expected = Map(0L -> 5L, 1L -> 6L, 2L -> 6L, 3L -> 6L,
    4L -> 6L, 5L -> 6L, 6L -> 5L)

  test("bucketed catalog table: groupBy(key) plans with no shuffle " +
      "and exact results") {
    MemorySinkRegistry.clear(); GraftCatalogRegistry.clear()
    createAndFill("t_kgp", bucketed = true)
    withBucketing {
      val agg = spark.table("graft.t_kgp").groupBy("id").count()
      assert(shuffles(agg) == 0,
        agg.queryExecution.executedPlan.toString)
      val got = agg.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected)
    }
  }

  test("filters keep the key-grouped layout (still no shuffle)") {
    MemorySinkRegistry.clear(); GraftCatalogRegistry.clear()
    createAndFill("t_kgp_f", bucketed = true)
    withBucketing {
      val agg = spark.table("graft.t_kgp_f").filter("score > 10.0")
        .groupBy("id").count()
      assert(shuffles(agg) == 0,
        agg.queryExecution.executedPlan.toString)
      assert(agg.collect().map(_.getLong(1)).sum == 34L) // 40 - 6 rows
    }
  }

  test("unpartitioned catalog table: groupBy keeps its shuffle") {
    MemorySinkRegistry.clear(); GraftCatalogRegistry.clear()
    createAndFill("t_bal", bucketed = false)
    withBucketing {
      val agg = spark.table("graft.t_bal").groupBy("id").count()
      assert(shuffles(agg) == 1,
        agg.queryExecution.executedPlan.toString)
      assert(agg.collect().map(_.getLong(1)).sum == 40L)
    }
  }

  test("grouping on a non-key column stays correct (with shuffle)") {
    MemorySinkRegistry.clear(); GraftCatalogRegistry.clear()
    createAndFill("t_kgp_p", bucketed = true)
    withBucketing {
      val agg = spark.table("graft.t_kgp_p").groupBy("name").count()
      assert(agg.collect().length == 40)
    }
  }

  test("bucketing disabled: plan keeps the shuffle, results identical") {
    MemorySinkRegistry.clear(); GraftCatalogRegistry.clear()
    createAndFill("t_kgp_off", bucketed = true)
    val agg = spark.table("graft.t_kgp_off").groupBy("id").count()
    assert(shuffles(agg) == 1)
    assert(agg.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      == expected)
  }

  test("path-based read has no function catalog: shuffle stays even " +
      "with hash options declared") {
    MemorySinkRegistry.clear(); GraftCatalogRegistry.clear()
    createAndFill("t_kgp_path", bucketed = true)
    withBucketing {
      val agg = spark.read.format("clickhouse-style")
        .schema(schema)
        .option("url", "clickhouse://localhost:8123")
        .option("table-name", "t_kgp_path")
        .option("graft.executor", "memory")
        .option("sink.partition-strategy", "hash")
        .option("sink.partition-key", "id")
        .load().groupBy("id").count()
      assert(shuffles(agg) == 1,
        agg.queryExecution.executedPlan.toString)
      assert(agg.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        == expected)
    }
  }

  test("storage-partitioned join: two bucketed tables join on the key " +
      "with no shuffle") {
    MemorySinkRegistry.clear(); GraftCatalogRegistry.clear()
    import spark.implicits._
    configureCatalog()
    spark.sql("CREATE TABLE graft.t_spj_a (id BIGINT, name STRING, " +
      "score DOUBLE) PARTITIONED BY (bucket(4, id))")
    spark.sql("CREATE TABLE graft.t_spj_b (id BIGINT, name STRING, " +
      "score DOUBLE) PARTITIONED BY (bucket(4, id))")
    (1L to 40L).map(i => (i % 7, s"a$i", i * 1.5))
      .toDF("id", "name", "score")
      .coalesce(2).writeTo("graft.t_spj_a").append()
    (1L to 10L).map(i => (i % 7, s"b$i", i * 2.0))
      .toDF("id", "name", "score")
      .coalesce(2).writeTo("graft.t_spj_b").append()
    withBucketing {
      // disable the broadcast fallback so the join must pick SMJ and
      // the key-grouped layout is what removes the exchanges
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val j = spark.table("graft.t_spj_a").as("a")
          .join(spark.table("graft.t_spj_b").as("b"), "id")
          .selectExpr("id", "a.name", "b.name as bname")
        assert(shuffles(j) == 0, j.queryExecution.executedPlan.toString)
        // 40 left rows over id=i%7 joined to 10 right rows over id=i%7:
        // right has ids 1..6 once, id 0 never appears twice... compute:
        // right ids: 1,2,3,4,5,6,0,1,2,3 -> id0:1, id1:2, id2:2, id3:2,
        // id4:1, id5:1, id6:1. left counts: id0:5,1:6,2:6,3:6,4:6,5:6,6:5
        val n = j.collect().length
        assert(n == 5*1 + 6*2 + 6*2 + 6*2 + 6*1 + 6*1 + 5*1)
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("catalog DDL surface: exists / drop / duplicate-create rejected") {
    MemorySinkRegistry.clear(); GraftCatalogRegistry.clear()
    createAndFill("t_ddl", bucketed = true)
    assert(spark.catalog.tableExists("graft.t_ddl"))
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE graft.t_ddl (id BIGINT)")
    }
    assert(e.getMessage.toLowerCase.contains("already exists"))
    spark.sql("DROP TABLE graft.t_ddl")
    assert(!spark.catalog.tableExists("graft.t_ddl"))
    assert(MemorySinkRegistry.allFor("t_ddl").isEmpty)
  }

  test("non-bucket PARTITIONED BY is rejected at create time") {
    MemorySinkRegistry.clear(); GraftCatalogRegistry.clear()
    configureCatalog()
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE graft.t_bad (id BIGINT, d DATE) " +
        "PARTITIONED BY (d)")
    }
    assert(e.getMessage.contains("bucket"), e.getMessage)
  }
}
