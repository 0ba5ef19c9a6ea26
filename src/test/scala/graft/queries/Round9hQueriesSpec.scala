package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-9 coverage-estimator batch at
  * sf0.001 (exact values ride the DuckDB oracle gate at sf0.01).
  */
class Round9hQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round9hQueries.queries(name)(spark, sf0001)

  test("q_capture_recapture: captures partition-consistent, estimate sane") {
    val r = run("q_capture_recapture").collect()(0)
    val (n1, n2, m, trueN) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(m <= math.min(n1, n2))
    assert(math.max(n1, n2) <= trueN)
    val est = r.getDouble(4)
    // Chapman is >= the union lower bound - 1 and exact when m = min
    assert(est >= math.max(n1, n2) - 1.0)
    assert(math.abs(r.getDouble(5) - est / trueN) < 1e-12)
  }

  test("q_chao1_vocab: estimate >= observed, identities hold") {
    val r = run("q_chao1_vocab").collect()(0)
    val (v, f1, f2, n) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(f1 + f2 <= v && v <= n)
    val est = r.getDouble(4)
    assert(est >= v.toDouble)
    val unseen = r.getDouble(5)
    assert(unseen >= 0.0 && unseen < 1.0)
    if (f1 <= 1) assert(math.abs(est - v.toDouble) < 1e-9)
  }

  test("q_quantile_ci: ranks ordered, values ordered, median inside CI") {
    val r = run("q_quantile_ci").collect()(0)
    val (n, lo, med, hi) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(1 <= lo && lo <= med && med <= hi && hi <= n)
    val (vLo, vMed, vHi) = (r.getDouble(4), r.getDouble(5), r.getDouble(6))
    assert(vLo <= vMed && vMed <= vHi)
    // CI width shrinks as ~1/sqrt(n): at least it is a proper interval
    assert(vHi - vLo >= 0.0)
  }

  test("q_quantile_ci median matches a brute-force sorted lookup") {
    val prices = graft.Tables(spark, sf0001, "orders")
      .select("o_totalprice", "o_orderkey").collect()
      .map(r => (BigDecimal(r.getDouble(0)).setScale(2, BigDecimal.RoundingMode.HALF_UP), r.getLong(1)))
      .sortBy(identity)
    val medRank = (prices.length + 1) / 2 // 1-based lower median
    val expected = prices(medRank - 1)._1.toDouble
    val got = run("q_quantile_ci").collect()(0).getDouble(5)
    assert(math.abs(got - expected) < 1e-9,
      s"median $got vs brute $expected")
  }
}
