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
    // the one surface that wants AQE ON by default: its whole point is
    // showing the final adaptive plan a cluster would run
    val spark = GraftSession.build(cpus = cpus, appName = "graft-explain",
      aqeDefault = "true")
    names.foreach { n =>
      println(s"===== $n =====")
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.explain("formatted")
      val t0 = System.nanoTime()
      try {
        df.write.format("noop").mode("overwrite").save()
        println(f"[explain] $n forced in ${(System.nanoTime() - t0) / 1e9}%.2f s")
        println("== final adaptive plan ==")
        println(df.queryExecution.executedPlan.toString.take(4000))
      } finally {
        // the noop save normally fires the after-action scope release,
        // but a failed query must not strand its retained frames — and a
        // clean cache keeps the NEXT query's printed plan free of this
        // one's InMemoryRelation substitutions (r6 verdict #3: the same
        // carryover polluted the committed plan contracts)
        CacheScope.releaseAll(spark)
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
