package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkSuite}

/** Mechanical guards on the physical plans of headline queries — the
  * scale posture (pushdown, broadcast choice, shuffle count) is part of
  * each query's contract, and a refactor that silently loses it would
  * still pass the value-correctness gate. These assertions fail it
  * instead. (Plan snapshots with commentary: PLANS.md.)
  */
class PlanAssertionsSpec extends AnyFunSuite with SparkSuite {

  import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
  import org.apache.spark.sql.execution.SparkPlan
  import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

  import graft.plans.PlanSignature

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf0001)
      .queryExecution.executedPlan.toString

  /** All shuffle Exchange nodes in the plan TREE (the shared
    * AQE-descending walker) — string-matching the rendered plan flakes
    * on AQE formatting changes; operator nodes don't.
    */
  private def shuffles(p: SparkPlan): Seq[ShuffleExchangeLike] =
    PlanSignature.nodes(p).collect { case e: ShuffleExchangeLike => e }

  test("q_filter_project pushes predicates into the parquet scan") {
    val p = plan("q_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity)") ||
      p.contains("GreaterThan(l_quantity,30.0)"), p.take(2000))
  }

  test("q_broadcast_join broadcasts the dimension side") {
    assert(plan("q_broadcast_join").contains("BroadcastHashJoin"))
  }

  test("q_tpch_q5: every dimension join is broadcast (fact streams once)") {
    val p = plan("q_tpch_q5")
    assert(p.sliding("BroadcastHashJoin".length)
      .count(_ == "BroadcastHashJoin") >= 4, p.take(3000))
    // the only hash-partition exchanges are for the final aggregate,
    // never for a join input
    assert(!p.contains("SortMergeJoin"))
  }

  test("q_asof_join shuffles event data exactly once (plus output sort)") {
    val exec = SparkEntry.queries("q_asof_join")(spark, sf0001)
      .queryExecution.executedPlan
    val hashExchanges = shuffles(exec)
      .count(_.outputPartitioning.isInstanceOf[HashPartitioning])
    assert(hashExchanges == 1,
      s"expected 1 hash-partitioned exchange node, plan:\n$exec")
  }

  test("decontam_ngram broadcasts the benchmark gram set") {
    assert(plan("decontam_ngram").contains("BroadcastHashJoin"))
  }

  test("dedup_exact shuffles the 64-char hash, never the document body") {
    val p = plan("dedup_exact")
    // partial aggregation below the exchange: map-side combine present
    assert(p.contains("HashAggregate"))
    assert(p.contains("sha2"))
    // the exchange partitions on the computed hash column — the raw
    // text column must not ride through the shuffle
    val exchangeLines = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchangeLines.nonEmpty)
    assert(exchangeLines.forall(!_.contains("text#")),
      s"document body in shuffle key:\n${exchangeLines.mkString("\n")}")
  }

  test("pair-query fence: threshold filter is NOT cloned into the join") {
    // ColumnPruning can delete an unreferenced nondeterministic fence
    // column, letting the sim filter (and its dot product) slide into
    // the join condition — 1 extra evaluation per candidate pair plus
    // derived isnotnull(dot) scans. fencedFilter pins the fence; this
    // guards the pin.
    for (q <- Seq("similarity_self_join_dedup", "similarity_lsh_bucketed",
        "dedup_embedding_cosine", "dedup_ngram_jaccard",
        "dedup_containment")) {
      val exec = SparkEntry.queries(q)(spark, sf0001)
        .queryExecution.executedPlan
      val joinConds = PlanSignature.nodes(exec).collect {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec =>
          j.condition
      }.flatten
      assert(!joinConds.exists(c =>
          c.toString.contains("vectordotproduct") ||
          c.toString.contains("arrayintersectsize")),
        s"$q: expensive expression cloned into join condition")
    }
  }

  test("q_bloom_join probes the bloom filter on the fact side pre-join") {
    val p = plan("q_bloom_join")
    assert(p.contains("bloommightcontain"), p.take(2000))
  }

  test("q_shuffle_hash_join honors the shuffle-hash hint") {
    assert(plan("q_shuffle_hash_join").contains("ShuffledHashJoin"))
  }

  test("similarity_knn_join broadcasts probes; no pairwise shuffle") {
    val p = plan("similarity_knn_join")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"))
  }
}
