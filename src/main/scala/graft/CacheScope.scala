package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.storage.StorageLevel

/** Scoped persists for query builders (r5 verdict #5).
  *
  * Iterative builders (graph_pagerank's edge set, HITS' per-iteration
  * score relations, connected-components supersteps, k-core peeling)
  * persist intermediates that every iteration reuses — correct, and at
  * any scale an iterative graph algorithm caches its edges. But a
  * builder cannot unpersist what its RETURNED DataFrame still needs, so
  * a plain `.persist` leaks MEMORY_AND_DISK blocks into any long-lived
  * session: the r4 bench measured 5 queries 6-40x slower downstream of
  * the first leaked persist before the harness grew its own clearCache.
  *
  * Builders call `retain(df)` instead of `persist`; SparkEntry wraps
  * every query builder in `scoped { ... }`, which binds all frames
  * retained while the builder ran to the builder's RETURNED plan. A
  * QueryExecutionListener (installed by GraftSession) releases the whole
  * scope right after the first completed action whose analyzed plan
  * contains that returned plan — i.e. exactly when the query that needed
  * the caches has been consumed. Mid-build actions (e.g. cc_labels'
  * convergence `count()`s) do NOT release anything: the scope isn't
  * bound until the builder returns, so frames a later iteration still
  * needs are never pulled out from under it (mid-query unpersist
  * reproduced the r3 ContextCleaner stall).
  *
  * The harness seam: Bench builds its session with
  * `spark.graft.cache.autoRelease=false` because its min-of-two-passes
  * methodology deliberately lets pass 2 reuse pass 1's blocks (steady-
  * state timing) and clears the cache itself between queries. Library
  * sessions keep the default (on), so no MEMORY_AND_DISK block outlives
  * the action that consumed it (CacheScopeSpec pins this).
  */
object CacheScope {

  val ConfKey = "spark.graft.cache.autoRelease"

  /** When "true", [[retain]] records each frame's PRE-persist physical
    * plan in a thread-local ledger (drained by [[drainCapturedPlans]]).
    * The plan-contract machinery needs this (r8 verdict #5): the final
    * consumer plan hides every exchange inside a retained derivation
    * behind an InMemoryTableScan, so e.g. bpe_train_loop's contract
    * read `shuffles=0` while its five training iterations each
    * shuffled twice. Off by default — production sessions must not pay
    * for plan forcing at retain time.
    */
  val CaptureKey = "spark.graft.cache.capturePlans"

  private val capturedPlans =
    new ThreadLocal[List[org.apache.spark.sql.execution.SparkPlan]] {
      override def initialValue(): List[org.apache.spark.sql.execution.SparkPlan] = Nil
    }

  private def captureEnabled(s: SparkSession): Boolean =
    s.conf.get(CaptureKey, "false") == "true"

  /** Drain the captured pre-cache plans of every retain on THIS thread
    * since the last drain (oldest first). Contract tooling only.
    */
  private[graft] def drainCapturedPlans(): Seq[org.apache.spark.sql.execution.SparkPlan] = {
    val l = capturedPlans.get(); capturedPlans.set(Nil); l.reverse
  }

  private final case class Scope(plan: LogicalPlan, frames: List[DataFrame])

  // frames retained while the current thread's builder is running;
  // bound into a Scope when the enclosing scoped{} returns
  private val pending = new ThreadLocal[List[DataFrame]] {
    override def initialValue(): List[DataFrame] = Nil
  }
  private val inScope = new ThreadLocal[Boolean] {
    override def initialValue(): Boolean = false
  }

  // session -> scopes awaiting their consuming action; sessions are few
  // and scopes transient, so a plain synchronized map is fine
  private val scopes =
    scala.collection.mutable.Map.empty[SparkSession, List[Scope]]
  private val installed =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  private def enabled(s: SparkSession): Boolean =
    s.conf.get(ConfKey, "true") == "true"

  /** Drop map entries whose session's context has stopped (r7 ADVICE
    * low: the strong-keyed `scopes`/`installed` maps pinned a stopped
    * session — and transitively its plans and frames — forever if its
    * scopes were never consumed or drained). There is no public
    * per-session stop listener in Spark, so the prune is swept on the
    * shared map's touch points: every `scoped` binding and every
    * `consumed` callback from ANY live session clears the dead ones.
    * The onApplicationEnd hook (install) remains the immediate path
    * when the whole context dies. No unpersist for dead sessions: their
    * block manager is gone with the context.
    *
    * `isDead` is injectable only for the spec — stopping a real context
    * would kill the suite's shared session.
    */
  private[graft] def pruneStopped(
      isDead: SparkSession => Boolean = _.sparkContext.isStopped): Unit = {
    val dead = scopes.synchronized {
      val d = scopes.keys.filter(s =>
        try isDead(s) catch { case _: Throwable => true }).toList
      d.foreach(scopes.remove)
      d
    }
    dead.foreach(installed.remove)
  }

  // spec hook: current number of sessions with open scopes
  private[graft] def openSessionCount: Int =
    scopes.synchronized(scopes.size)

  /** Persist `df` (MEMORY_AND_DISK); released with the enclosing scope
    * after the action that consumes the scope's result, when the session
    * has auto-release on (the default outside the bench harness).
    *
    * Tracking happens ONLY inside an enclosing `scoped {}` (ADVICE r6):
    * a bare retain outside any scope used to park the frame in the
    * thread-local, where the NEXT unrelated scoped call on the same
    * thread captured it — released after someone else's action, or never.
    * Outside a scope, retain is now just a persist and the caller owns
    * the unpersist (releaseAll remains the manual drain for sessions).
    */
  def retain(df: DataFrame): DataFrame = {
    // capture BEFORE persist: this is the frame's first-materialization
    // plan, with earlier retained frames already substituted as
    // InMemoryTableScans (so nested retains never double-count an
    // exchange) but its OWN exchanges still visible
    if (captureEnabled(df.sparkSession))
      capturedPlans.set(df.queryExecution.executedPlan :: capturedPlans.get())
    df.persist(StorageLevel.MEMORY_AND_DISK)
    if (inScope.get() && enabled(df.sparkSession))
      pending.set(df :: pending.get())
    df
  }

  /** Bind the frames retained while `build` runs to its returned plan;
    * they are unpersisted right after the first completed action that
    * consumes that plan. Nesting composes: an inner scope's frames fold
    * into the outer scope (released with the outermost result). If the
    * builder throws, nothing will ever consume its retained frames, so
    * they are unpersisted on the spot instead of lingering in the
    * thread-local (ADVICE r6).
    */
  def scoped(build: => DataFrame): DataFrame = {
    if (inScope.get()) return build // inner builder: outer scope owns all
    inScope.set(true)
    val df = try build
      catch { case e: Throwable =>
        pending.get().foreach(f =>
          try f.unpersist(blocking = false) catch { case _: Throwable => () })
        pending.set(Nil)
        throw e
      }
      finally inScope.set(false)
    val captured = pending.get()
    pending.set(Nil)
    if (captured.nonEmpty) {
      pruneStopped()
      scopes.synchronized {
        scopes(df.sparkSession) =
          Scope(df.queryExecution.analyzed, captured) ::
            scopes.getOrElse(df.sparkSession, Nil)
      }
    }
    df
  }

  /** Unpersist every scope of `spark` immediately (manual drain). */
  def releaseAll(spark: SparkSession): Unit = {
    val ss = scopes.synchronized { scopes.remove(spark).getOrElse(Nil) }
    ss.flatMap(_.frames).foreach(f =>
      try f.unpersist(blocking = false) catch { case _: Throwable => () })
  }

  /** Idempotently install the after-action release listener, plus a
    * context-end hook that prunes the session's entries from the strong-
    * keyed maps (ADVICE r6: a stopped session whose unconsumed scopes
    * were never drained used to pin its plans and frames forever).
    */
  def install(spark: SparkSession): Unit =
    if (installed.add(spark)) {
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onApplicationEnd(
              e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
            scopes.synchronized { scopes.remove(spark) } // context is dying;
            installed.remove(spark)                      // no unpersist needed
          }
        })
      spark.listenerManager.register(new QueryExecutionListener {
        private def consumed(qe: QueryExecution): Unit = {
          val s = qe.sparkSession
          pruneStopped() // sweep dead sessions on any live session's action
          val open = scopes.synchronized { scopes.getOrElse(s, Nil) }
          if (open.nonEmpty) {
            // an action consumed a scope iff its analyzed plan contains
            // the scope's result plan as a subtree (the same sameResult
            // test CacheManager's own cache lookup uses)
            val (done, keep) = open.partition(sc =>
              try qe.analyzed.exists(_.sameResult(sc.plan))
              catch { case _: Throwable => false })
            if (done.nonEmpty) {
              scopes.synchronized { scopes(s) = keep }
              done.flatMap(_.frames).foreach(f =>
                try f.unpersist(blocking = false)
                catch { case _: Throwable => () })
            }
          }
        }
        override def onSuccess(f: String, qe: QueryExecution, ns: Long): Unit =
          consumed(qe)
        override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit =
          consumed(qe)
      })
    }
}
