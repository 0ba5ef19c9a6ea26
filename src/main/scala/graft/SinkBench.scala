package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sink.dsv2.MemorySinkRegistry

/** Sink write-path throughput: pushes the sf0.1 lineitem table (600k rows,
  * 11 columns) through the full DSv2 path — option validation, mode
  * dispatch, InternalRow conversion, count-trigger buffering — into the
  * in-memory executor. Prints one JSON line with rows/sec. The reference's
  * comparable figure is bounded by its ClickHouse server, which does not
  * exist offline; this measures everything on our side of that socket.
  */
object SinkBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(cpus = cpus, appName = "graft-sink-bench")

    val li = Tables(spark, sfDir, "lineitem")
      .repartition(cpus.toInt)
      .cache()
    val n = li.count() // materialize cache so the write measures the sink

    def write(): Double = {
      MemorySinkRegistry.clear()
      val t0 = System.nanoTime()
      li.write.format("clickhouse-style")
        .option("url", "clickhouse://localhost:8123")
        .option("table-name", "lineitem_sink")
        .option("sink.batch-size", "100000") // the README's production value
        .option("graft.executor", "memory")
        .mode("append").save()
      (System.nanoTime() - t0) / 1e9
    }
    write() // warm-up
    val sec = write()
    val written = MemorySinkRegistry.all.map(_._2.size).sum
    assert(written == n, s"wrote $written of $n rows")
    println(f"""{"metric":"sink_rows_per_sec","value":${n / sec}%.0f,"rows":$n,"sec":$sec%.3f}""")
    spark.stop()
  }
}
