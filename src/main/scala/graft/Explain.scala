package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection: print the formatted physical plan (and optionally time
  * a forced materialization) for named queries.
  * Usage: sbt "runMain graft.Explain <sfDir> <query> [query...]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // AQE coalescing is byte-based and its merge decisions flip run to
      // run on the few-MB shuffles that feed quadratic per-pair CPU work
      // (near-dup joins), serializing them unpredictably (1-18s swings).
      // Plain 32-way shuffles cost only task-startup ms at this scale.
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"===== $n =====")
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.explain("formatted")
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[explain] $n forced in ${(System.nanoTime() - t0) / 1e9}%.2f s")
      println("== final adaptive plan ==")
      println(df.queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
