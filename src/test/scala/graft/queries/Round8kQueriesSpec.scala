package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-8 agreement/survival/sketch batch
  * at sf0.001 (exact values ride the DuckDB oracle gate at sf0.01).
  */
class Round8kQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round8kQueries.queries(name)(spark, sf0001)

  test("q_spearman_metrics: rho in [-1,1], d2 bounded by worst case") {
    val r = run("q_spearman_metrics").collect()(0)
    val (n, sumD2, rho) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(n > 0)
    assert(rho >= -1.0 && rho <= 1.0, s"rho $rho out of [-1,1]")
    // worst case sum d^2 = n(n^2-1)/3 (perfect anti-correlation)
    assert(sumD2 >= 0 && sumD2 <= n * (n * n - 1) / 3)
    // length and distinct-token count must agree strongly positively
    assert(rho > 0.5, s"length vs uniq-token rho $rho implausibly low")
  }

  test("q_km_survival: monotone nonincreasing in t, in [0,1]") {
    val rows = run("q_km_survival").collect()
    assert(rows.length == 4)
    val surv = rows.sortBy(_.getLong(0)).map(_.getDouble(1))
    assert(surv.forall(v => v >= -1e-12 && v <= 1.0 + 1e-12))
    assert(surv.sliding(2).forall { case Array(x, y) => y <= x + 1e-12 },
      s"survival not nonincreasing: ${surv.mkString(",")}")
  }

  test("q_bbit_minhash: errors bounded by 2, quantiles ordered") {
    val r = run("q_bbit_minhash").collect()(0)
    val (n, med, p90, mx) = (r.getLong(0), r.getDouble(1),
      r.getDouble(2), r.getDouble(3))
    assert(n > 0)
    // jest in [-1,1], jexact in [0,1] -> abs err <= 2
    assert(med >= 0.0 && med <= p90 && p90 <= mx && mx <= 2.0)
  }
}
