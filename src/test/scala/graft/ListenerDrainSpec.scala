package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.AtomicInteger

/** Pins the r7 ADVICE low on Bench's per-pass metric sampling: TaskEnd
  * events arrive on the listener bus's async dispatch threads, so
  * counters read right after an action could miss the tail of the pass.
  * Bench now drains the bus (GraftSparkInternals.drainListenerBus)
  * before sampling — this spec proves the drain makes the sampled
  * counters complete with NO sleep between action and read.
  */
class ListenerDrainSpec extends SparkSuite {

  test("counters sampled after a drain see every task of the action") {
    val seen = new AtomicInteger(0)
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        seen.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // quiesce whatever earlier suites left in flight, then zero
      assert(org.apache.spark.graft.GraftSparkInternals
        .drainListenerBus(spark.sparkContext, 10000), "pre-drain timed out")
      seen.set(0)
      // 8 partitions -> at least 8 tasks in this job
      val n = spark.range(0, 1000, 1, 8).toDF("id").count()
      assert(n == 1000)
      val drained = org.apache.spark.graft.GraftSparkInternals
        .drainListenerBus(spark.sparkContext, 10000)
      assert(drained, "drain timed out on an idle context")
      // sampled immediately after the drain — no sleep, no polling
      assert(seen.get() >= 8,
        s"only ${seen.get()} TaskEnd events visible after drain")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("drain on an idle context returns promptly") {
    val t0 = System.nanoTime()
    assert(org.apache.spark.graft.GraftSparkInternals
      .drainListenerBus(spark.sparkContext, 5000))
    assert((System.nanoTime() - t0) / 1e9 < 5.0)
  }
}
