package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-8 experimentation batch at
  * sf0.001 (exact values ride the DuckDB oracle gate at sf0.01).
  */
class Round8zQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round8zQueries.queries(name)(spark, sf0001)

  test("q_cuped: rho2 in [0,1], reduction factor complements it") {
    val r = run("q_cuped").collect()(0)
    val (n, theta, rho2, vrf) = (r.getLong(0), r.getDouble(1),
      r.getDouble(2), r.getDouble(3))
    assert(n > 0)
    assert(rho2 >= 0.0 && rho2 <= 1.0 + 1e-9, s"rho2 $rho2")
    assert(math.abs(vrf - (1.0 - rho2)) < 1e-12)
    assert(!theta.isNaN && !theta.isInfinite)
  }

  test("q_power_analysis: n shrinks quadratically with delta") {
    val rows = run("q_power_analysis").collect()
    assert(rows.map(_.getDouble(0)).toSeq == Seq(0.01, 0.02, 0.05))
    val ns = rows.map(_.getLong(4))
    assert(ns(0) > ns(1) && ns(1) > ns(2))
    // quadratic scaling: quadrupling delta/2 halves... n(0.01)/n(0.02)≈4
    val ratio = ns(0).toDouble / ns(1).toDouble
    assert(ratio > 3.5 && ratio < 4.5, s"ratio $ratio")
    val p = rows(0).getDouble(2)
    assert(p > 0.0 && p < 1.0)
  }

  test("q_did_estimator: 2x2 cells populated, identity holds") {
    val r = run("q_did_estimator").collect()(0)
    val (tp, tq, cp, cq, did) = (r.getDouble(0), r.getDouble(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4))
    Seq(tp, tq, cp, cq).foreach(v => assert(v > 0.0))
    assert(math.abs(did - ((tq - tp) - (cq - cp))) < 1e-9)
  }
}
