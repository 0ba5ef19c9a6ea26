package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-9 survey-sampling batch at
  * sf0.001 (exact values ride the DuckDB oracle gate at sf0.01).
  */
class Round9jQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round9jQueries.queries(name)(spark, sf0001)

  test("q_neyman_allocation: budgets respected, sizes sane") {
    val rows = run("q_neyman_allocation").collect()
    assert(rows.length == 5)
    val neyman = rows.map(_.getLong(3))
    val prop = rows.map(_.getLong(4))
    // floors can undershoot by at most 1 per stratum
    assert(neyman.sum <= 1000 && neyman.sum >= 1000 - 5)
    assert(prop.sum <= 1000 && prop.sum >= 1000 - 5)
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getDouble(2) > 0.0) // price variance is never 0 here
    }
  }

  test("q_design_effect: neyman <= proportional <= ... and deffs match") {
    val r = run("q_design_effect").collect()(0)
    val (vSrs, vProp, vNey) =
      (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(vSrs > 0 && vProp > 0 && vNey > 0)
    // Neyman is optimal among stratified allocations (Cauchy-Schwarz)
    assert(vNey <= vProp * (1 + 1e-12))
    assert(math.abs(r.getDouble(4) - vProp / vSrs) < 1e-12)
    assert(math.abs(r.getDouble(5) - vNey / vSrs) < 1e-12)
    // within-strata variance can't exceed total variance (ANOVA), up to
    // the finite-sample n/(n-1) corrections
    assert(vProp <= vSrs * 1.01)
  }

  test("q_horvitz_thompson: estimator is unbiased-shaped and close") {
    val r = run("q_horvitz_thompson").collect()(0)
    val (nPop, nSampled) = (r.getLong(0), r.getLong(1))
    val (nHat, relErr) = (r.getDouble(2), r.getDouble(3))
    assert(nSampled > 0 && nSampled <= nPop)
    assert(nHat > 0)
    assert(math.abs(relErr - math.abs(nHat - nPop) / nPop) < 1e-12)
    // with pi >= 16/1024 and thousands of draws the estimate lands well
    // within 25% of truth (deterministic coin - this is a fixed number)
    assert(relErr < 0.25, s"rel_err $relErr")
  }
}
