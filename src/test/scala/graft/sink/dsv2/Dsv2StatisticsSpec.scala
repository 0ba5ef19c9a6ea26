package graft.sink.dsv2

import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** SupportsReportStatistics: the memory endpoint reports exact row
  * counts + schema-derived size, so Spark's join planner broadcasts a
  * small ClickHouse table instead of shuffling both sides.
  */
class Dsv2StatisticsSpec extends AnyFunSuite with SparkSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType)))

  private def writeDim(table: String, n: Int): Unit = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, s"dim$i")).toDF("id", "name")
      .coalesce(1).write.format("clickhouse-style")
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

  test("small memory table reports stats and auto-broadcasts in a join") {
    MemorySinkRegistry.clear()
    writeDim("t_stats_dim", 50)
    import spark.implicits._
    val fact = (1L to 1000L).map(i => (i % 50 + 1, i)).toDF("id", "v")
    val j = fact.join(readBack("t_stats_dim"), "id")
    val bhj = j.queryExecution.executedPlan.collect {
      case b: BroadcastHashJoinExec => b
    }
    assert(bhj.nonEmpty, j.queryExecution.executedPlan.toString)
    assert(j.collect().length == 1000)
  }

  test("scan statistics are exact for the buffered rows") {
    MemorySinkRegistry.clear()
    writeDim("t_stats_n", 37)
    val df = readBack("t_stats_n")
    val scan = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan
    }.head
    val stats = scan.asInstanceOf[
      org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics()
    assert(stats.numRows().getAsLong == 37L)
    assert(stats.sizeInBytes().getAsLong ==
      37L * (8 + StringType.defaultSize))
  }
}
