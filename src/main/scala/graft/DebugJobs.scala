package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Measurement diagnostic (r12, guide §1/§7.3): run one query twice
  * (cold + warm) with per-job start/end wall times on stderr. The gaps
  * BETWEEN jobs are driver-side work — Catalyst analysis/optimization,
  * CacheManager canonicalization, scheduling — which the per-pass task
  * counters in BENCH_DETAILS can bound but not localize. This is the
  * tool that found dedup_cc_star's 2.75 s zero-jobs-running planning
  * gap (see OPTIMIZATION_r12.md). Not a driver surface; dev-only.
  *
  * Usage: runMain graft.DebugJobs <queryName> [sfDir]
  */
object DebugJobs {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.build(cpus = "32", appName = "graft-debug",
      autoReleaseCaches = false)
    val t00 = System.nanoTime()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        starts.put(e.jobId, System.nanoTime())
        System.err.println(f"[dbg] job ${e.jobId} START at ${(System.nanoTime()-t00)/1e9}%.3f s (${e.stageIds.size} stages)")
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val d = (System.nanoTime() - starts.getOrDefault(e.jobId, System.nanoTime())) / 1e9
        System.err.println(f"[dbg] job ${e.jobId} END   at ${(System.nanoTime()-t00)/1e9}%.3f s (took $d%.3f s)")
      }
    })
    for (pass <- 1 to 2) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      System.err.println(f"[dbg] pass $pass wall ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    spark.stop()
  }
}
