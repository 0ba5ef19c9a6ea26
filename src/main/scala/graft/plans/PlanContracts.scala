package graft.plans

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Regenerates the committed plan-signature contract after an INTENDED
  * plan change:
  *
  *   sbt "runMain graft.plans.PlanContracts"
  *
  * then review the diff of src/test/resources/plan-contracts.tsv — every
  * changed line is a query whose shuffle/broadcast/cartesian posture
  * moved, and the diff review is the moment to ask whether that was the
  * point of the change. The session config mirrors SparkSuite (local[4],
  * 4 shuffle partitions) so the spec reproduces identical plans.
  */
object PlanContracts {

  /** Adjudicated nested-loop allowances (r11 verdict #1). `bnlj` in the
    * signature counts only UNHINTED, UNBOUNDED BroadcastNestedLoopJoins
    * — the silent planner fallback a BandJoinRewrite regression would
    * present as (author-`broadcast()`-hinted builds and builds Catalyst
    * proves ≤4096 rows are excluded at the [[PlanSignature]] level).
    * Every key whose contract still carries bnlj>0 must have an entry
    * here with the smallness argument; generation fails loud otherwise,
    * and fails on STALE entries too so the list can't rot.
    */
  val AllowedBnlj: Map[String, String] = Map(
    "q_cross_join" -> ("deliberate cartesian SEMANTICS over bounded " +
      "dims: region (5 rows) x nation (25 rows) - the cross product IS " +
      "the query"),
    "q_dedup_pair_recall" -> ("exact-truth self-join literal-bounded to " +
      "doc_id < 300 in the builder; small-n baseline measuring what the " +
      "LSH bands miss"),
    "similarity_self_join_dedup" -> ("declared small-n exact baseline; " +
      "similarity_lsh_bucketed is the at-scale path for the same " +
      "semantics"))

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("src/test/resources/plan-contracts.tsv")
    val spark = graft.GraftSession.build(cpus = "4",
      appName = "graft-plan-contracts")
    // capture retained frames' pre-cache plans so exchanges inside
    // CacheScope.retain'ed derivations are folded into the signature
    // (r8 verdict #5: bpe_train_loop's contract read shuffles=0)
    spark.conf.set(graft.CacheScope.CaptureKey, "true")

    val lines = SparkEntry.queries.toSeq.sortBy(_._1).map { case (n, f) =>
      graft.CacheScope.drainCapturedPlans() // isolate from prior query
      val df = f(spark, "/root/testdata/sf0.001")
      val retained = graft.CacheScope.drainCapturedPlans()
      val sig = PlanSignature.of(df, retained)
      val hasBnlj = !sig.endsWith("bnlj=0")
      val line = (hasBnlj, AllowedBnlj.get(n)) match {
        case (true, Some(reason)) => s"$n\t$sig\t# bnlj allowed: $reason"
        case (true, None) => sys.error(s"[plan-contracts] $n plans an " +
          s"unhinted, unbounded BroadcastNestedLoopJoin ($sig) with no " +
          "AllowedBnlj adjudication - either a silent quadratic fallback " +
          "(fix the query/rule) or a missing allowance (add the " +
          "smallness argument to PlanContracts.AllowedBnlj)")
        case _ => s"$n\t$sig"
      }
      // plan-only consumer: no action ever runs, so the after-action
      // listener can never release the builder's retained scope — drain
      // per query or the CacheManager registrations accumulate AND later
      // queries' plans can pick up InMemoryRelation substitutions from an
      // earlier query's still-registered frames (r6 verdict #3)
      graft.CacheScope.releaseAll(spark)
      line
    }
    val bnljKeys = lines.filter(_.contains("\t# bnlj allowed:"))
      .map(_.split("\t", 2)(0)).toSet
    val staleAllow = AllowedBnlj.keySet -- bnljKeys
    require(staleAllow.isEmpty, s"[plan-contracts] stale AllowedBnlj " +
      s"entries (no longer plan a counted BNLJ): ${staleAllow.mkString(", ")}")
    Option(Paths.get(out).getParent).foreach(Files.createDirectories(_))
    Files.write(Paths.get(out), (lines.mkString("\n") + "\n").getBytes)
    println(s"[plan-contracts] wrote ${lines.size} signatures to $out")
    spark.stop()
  }
}
