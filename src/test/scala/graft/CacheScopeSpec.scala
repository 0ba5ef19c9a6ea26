package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.BeforeAndAfterEach

/** Pins the r5-verdict #5 contract: a query builder's retained persists
  * (iterative edge sets, supersteps) do not outlive the action that
  * consumes the query — a long-lived session accumulates ZERO
  * MEMORY_AND_DISK blocks from the query library, with no manual
  * clearCache cooperation. (Bench opts out via
  * spark.graft.cache.autoRelease=false to keep pass-2 cache reuse; the
  * default session — this suite's — has auto-release on.)
  *
  * Order independence (r6 verdict #2): the session is shared across all
  * suites, and in the r6 full-suite run plan-only sweeps (PlanContractSpec)
  * left hundreds of retained frames registered before this suite ran, so
  * the global cache-empty assertions could never pass in suite order
  * (while passing 5/5 in isolation). Each test now starts from a drained
  * baseline, so the emptiness it asserts afterwards is ITS OWN query's —
  * whatever earlier suites leaked is cleared, not inherited.
  */
class CacheScopeSpec extends SparkSuite with BeforeAndAfterEach {

  override protected def beforeEach(): Unit = {
    CacheScope.releaseAll(spark)
    spark.catalog.clearCache()
    super.beforeEach()
  }

  private def cacheEmpty: Boolean = spark.sharedState.cacheManager.isEmpty

  // the release listener runs on the async listener bus; poll briefly
  private def awaitCacheEmpty(tag: String): Unit = {
    val deadline = System.nanoTime() + 15e9.toLong
    while (!cacheEmpty && System.nanoTime() < deadline) Thread.sleep(50)
    assert(cacheEmpty, s"$tag left persisted blocks behind")
  }

  private def run(name: String): Array[org.apache.spark.sql.Row] =
    SparkEntry.queries(name)(spark, sf0001).collect()

  test("graph_pagerank's persisted edge set is released after the action") {
    val rows = run("graph_pagerank")
    assert(rows.nonEmpty)
    awaitCacheEmpty("graph_pagerank")
  }

  test("iterative superstep persists (cc_labels) release after the action") {
    // mid-build convergence count()s must NOT release early (the scope
    // binds on builder return), and the final collect releases all
    val rows = run("dedup_cc_labels")
    assert(rows.nonEmpty)
    awaitCacheEmpty("dedup_cc_labels")
  }

  test("q_hits_bipartite / q_kcore_peel / q_bfs_hops scopes release") {
    Seq("q_hits_bipartite", "q_kcore_peel", "q_bfs_hops").foreach { q =>
      assert(run(q).nonEmpty, q)
      awaitCacheEmpty(q)
    }
  }

  test("retained frames ARE reused while the query runs (still cached)") {
    // sanity against over-eager release: inside a scope, the retained
    // frame stays cached until the scope's own action completes
    import org.apache.spark.sql.functions._
    val df = CacheScope.scoped {
      val base = spark.range(1000).toDF("id")
      val kept = CacheScope.retain(base.withColumn("x", col("id") * 2))
      assert(kept.storageLevel.useMemory, "retain must persist")
      kept.groupBy((col("x") % 10).as("m")).count()
    }
    assert(df.collect().length == 5) // x is even, x % 10 in {0,2,4,6,8}
    awaitCacheEmpty("synthetic scope")
  }

  test("a builder that throws releases its retained frames immediately (ADVICE r6)") {
    var kept: DataFrame = null
    intercept[RuntimeException] {
      CacheScope.scoped {
        kept = CacheScope.retain(spark.range(100).toDF("id"))
        throw new RuntimeException("builder blew up")
      }
    }
    // nothing will ever consume the scope, so the frames must not wait
    // for one — and must not be captured by the next scope on this thread
    assert(kept.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "thrown builder's retained frame still persisted")
    assert(cacheEmpty, "thrown builder left CacheManager registrations")
    val df = CacheScope.scoped {
      CacheScope.retain(spark.range(10).toDF("id")).groupBy().count()
    }
    assert(df.collect().length == 1)
    awaitCacheEmpty("scope after a thrown builder")
  }

  test("retain outside any scope is a caller-owned persist (ADVICE r6)") {
    val bare = CacheScope.retain(spark.range(50).toDF("id"))
    assert(bare.storageLevel.useMemory, "retain must still persist")
    // an unrelated scope on the same thread must not adopt-and-release it
    var inner: DataFrame = null
    val other = CacheScope.scoped {
      inner = CacheScope.retain(spark.range(60).toDF("id"))
      inner.groupBy().count()
    }
    assert(other.collect().length == 1)
    // the scope's own frame releases after the action (async listener)...
    val deadline = System.nanoTime() + 15e9.toLong
    while (inner.storageLevel.useMemory && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(!inner.storageLevel.useMemory, "unrelated scope's own frame must release")
    // ...but the bare retain is caller-owned and must survive untouched
    assert(bare.storageLevel.useMemory,
      "bare retain was adopted and released by an unrelated scope")
    assert(!cacheEmpty)
    bare.unpersist(blocking = true)
    awaitCacheEmpty("caller-owned cleanup")
  }

  test("stopped sessions are pruned from the scope map (ADVICE r7)") {
    // a session with an open (never-consumed) scope used to pin its
    // plans and frames in the strong-keyed map forever once it stopped.
    // The predicate is injected because actually stopping a context
    // would kill the suite's shared session — the production default is
    // _.sparkContext.isStopped, exercised on every scoped/consumed touch.
    val s2 = spark.newSession()
    val df = CacheScope.scoped {
      val s2range = s2.range(100).toDF("id")
      CacheScope.retain(s2range)
    }
    assert(CacheScope.openSessionCount >= 1, "scope was not registered")
    val before = CacheScope.openSessionCount
    // prune with a predicate matching only s2 — the 'stopped' session
    CacheScope.pruneStopped(isDead = _ eq s2)
    assert(CacheScope.openSessionCount == before - 1,
      "stopped session's scopes were not pruned")
    // in the test the session is not truly dead — drop its block manually
    df.unpersist(blocking = true)
    spark.catalog.clearCache()
    awaitCacheEmpty("prune cleanup")
  }

  test("opt-out session conf leaves release to the harness") {
    val prev = spark.conf.get(CacheScope.ConfKey, "true")
    try {
      spark.conf.set(CacheScope.ConfKey, "false")
      val df: DataFrame = CacheScope.scoped {
        CacheScope.retain(spark.range(100).toDF("id"))
      }
      df.collect()
      Thread.sleep(300) // give a (wrong) async release a chance to fire
      assert(!cacheEmpty, "opt-out must not auto-release")
      spark.catalog.clearCache()
    } finally spark.conf.set(CacheScope.ConfKey, prev)
    awaitCacheEmpty("opt-out cleanup")
  }
}
