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
      val sig = s"$n\t${PlanSignature.of(df, retained)}"
      // plan-only consumer: no action ever runs, so the after-action
      // listener can never release the builder's retained scope — drain
      // per query or the CacheManager registrations accumulate AND later
      // queries' plans can pick up InMemoryRelation substitutions from an
      // earlier query's still-registered frames (r6 verdict #3)
      graft.CacheScope.releaseAll(spark)
      sig
    }
    Option(Paths.get(out).getParent).foreach(Files.createDirectories(_))
    Files.write(Paths.get(out), (lines.mkString("\n") + "\n").getBytes)
    println(s"[plan-contracts] wrote ${lines.size} signatures to $out")
    spark.stop()
  }
}
