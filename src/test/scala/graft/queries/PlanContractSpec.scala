package graft.queries

import scala.io.Source

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkSuite}
import graft.plans.PlanSignature

/** The plan-regression sweep: EVERY query's physical-plan signature
  * (shuffle count, broadcast count, cartesian presence — the scale
  * posture) must match the committed contract. A refactor that keeps
  * values correct but silently adds a shuffle or drops a broadcast
  * fails here, not in production at 1000x the data.
  *
  * On an intended plan change, regenerate + review the diff:
  *   sbt "runMain graft.plans.PlanContracts"
  */
class PlanContractSpec extends AnyFunSuite with SparkSuite {

  private lazy val contracts: Map[String, String] = {
    val in = getClass.getResourceAsStream("/plan-contracts.tsv")
    assert(in != null, "plan-contracts.tsv missing from test resources — " +
      "run: sbt \"runMain graft.plans.PlanContracts\"")
    val src = Source.fromInputStream(in)
    try src.getLines().filter(_.nonEmpty).map { l =>
      val Array(k, v) = l.split("\t", 2); k -> v
    }.toMap
    finally src.close()
  }

  test("every query's plan signature matches the committed contract") {
    val diffs = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        val actual = PlanSignature.of(q(spark, sf0001))
        contracts.get(name) match {
          case Some(expected) if expected == actual => None
          case Some(expected) =>
            Some(s"$name: contract '$expected' but plan is '$actual'")
          case None =>
            Some(s"$name: no contract recorded")
        }
    }
    val stale = contracts.keySet -- SparkEntry.queries.keySet
    assert(diffs.isEmpty && stale.isEmpty,
      (diffs ++ stale.map(s => s"$s: contract for deleted query"))
        .mkString("\n", "\n", "\n") +
        "intended? regenerate: sbt \"runMain graft.plans.PlanContracts\"")
  }
}
