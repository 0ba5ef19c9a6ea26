package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-8 nonparametrics batch at
  * sf0.001 (exact values ride the DuckDB oracle gate at sf0.01).
  */
class Round8rQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round8rQueries.queries(name)(spark, sf0001)

  test("q_mann_whitney: U identity, positive tie-corrected variance") {
    val r = run("q_mann_whitney").collect()(0)
    val (na, nb) = (r.getLong(0), r.getLong(1))
    val (ua, ub) = (r.getDouble(2), r.getDouble(3))
    val (mu, s2) = (r.getDouble(5), r.getDouble(6))
    assert(na > 0 && nb > 0)
    // each of the nA*nB pairs contributes exactly 1 across U_A + U_B
    // under the mid-rank tie convention
    assert(math.abs(ua + ub - na.toDouble * nb) < 1e-9)
    assert(mu == na.toDouble * nb / 2.0)
    assert(s2 > 0.0)
    // tie correction can only SHRINK the variance vs the untied form
    assert(s2 <= na.toDouble * nb * (na + nb + 1) / 12.0 + 1e-9)
  }

  test("q_theil_sen: full pair census, finite fit") {
    val r = run("q_theil_sen").collect()(0)
    val (nDays, nPairs) = (r.getLong(0), r.getLong(1))
    val (slope, intercept) = (r.getDouble(2), r.getDouble(3))
    assert(nDays > 1 && nDays <= 64)
    assert(nPairs == nDays * (nDays - 1) / 2)
    assert(!slope.isNaN && !slope.isInfinite)
    assert(!intercept.isNaN && !intercept.isInfinite)
  }

  test("q_kendall_tau: pair partition consistent, |tau_b| <= 1") {
    val r = run("q_kendall_tau").collect()(0)
    val (nDays, n0) = (r.getLong(0), r.getLong(1))
    val (conc, disc) = (r.getLong(2), r.getLong(3))
    val (tx, ty) = (r.getLong(4), r.getLong(5))
    val tau = r.getDouble(6)
    assert(n0 == nDays * (nDays - 1) / 2)
    // concordant + discordant + (pairs tied on x or y) covers all pairs;
    // tx/ty overlap on both-tied pairs so the sum can exceed n0
    assert(conc + disc <= n0)
    assert(conc + disc + tx + ty >= n0)
    assert(math.abs(tau) <= 1.0 + 1e-12)
  }
}
