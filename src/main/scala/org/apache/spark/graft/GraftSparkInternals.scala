package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Same-package accessor for `private[spark]` surfaces the bench harness
  * needs (standard community pattern, e.g. spark-testing-base).
  *
  * Only member: draining the LiveListenerBus. Bench attributes per-pass
  * task metrics by job group, but TaskEnd events are delivered on the
  * bus's async dispatch threads — the tail of the CURRENT pass can still
  * be in flight when the counters are sampled, making the per-pass
  * tasks/run figures in BENCH_DETAILS a lower bound (ADVICE r6/r7 low).
  * `waitUntilEmpty` blocks until every queued event has been delivered,
  * so sampling after a successful drain reads a complete ledger.
  */
object GraftSparkInternals {

  /** Block until the context's listener bus has delivered all queued
    * events, or `timeoutMs` expires. Returns true on a clean drain;
    * false on timeout or a stopped/absent bus (callers treat the
    * sampled counters as a lower bound in that case, same as before).
    */
  def drainListenerBus(sc: SparkContext, timeoutMs: Long): Boolean =
    try { sc.listenerBus.waitUntilEmpty(timeoutMs); true }
    catch { case _: Throwable => false }
}
