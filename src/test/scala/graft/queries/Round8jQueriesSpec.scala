package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-8 shift-inference batch at
  * sf0.001 (exact values ride the DuckDB oracle gate at sf0.01).
  */
class Round8jQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round8jQueries.queries(name)(spark, sf0001)

  test("q_permutation_test: p-value well-formed, splits cover corpus") {
    val r = run("q_permutation_test").collect()(0)
    val (na, nb, nPerms, nExtreme, p) = (r.getLong(0), r.getLong(1),
      r.getLong(3), r.getLong(4), r.getDouble(5))
    assert(na > 0 && nb > 0)
    assert(nPerms > 0 && nPerms <= 200)
    assert(nExtreme >= 0 && nExtreme <= nPerms)
    assert(p >= 0.0 && p <= 1.0)
    assert(math.abs(p - nExtreme.toDouble / nPerms) < 1e-12)
    // the md5 split of a null-distributed corpus should NOT be
    // significant — a tiny p here would mean the splitter is biased
    assert(p > 0.001, s"suspiciously significant split p=$p")
  }

  test("q_psi_drift: ten bins, PSI small and nonnegative on null split") {
    val r = run("q_psi_drift").collect()(0)
    assert(r.getLong(0) == 10, s"expected 10 bins, got ${r.getLong(0)}")
    val psi = r.getDouble(1)
    // PSI is a symmetrized KL — nonnegative up to smoothing, and an
    // md5 A/B split of one population must sit far below the 0.2
    // "investigate" threshold
    assert(psi >= -1e-9 && psi < 0.2, s"PSI $psi out of expected range")
  }

  test("q_heavy_change: ranks dense, integer-consistent share deltas") {
    val rows = run("q_heavy_change").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    assert(rows.map(_.getLong(0)).toSeq ==
      (1L to rows.length.toLong).toSeq)
    rows.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(3) >= 0)
      assert(math.abs(r.getDouble(4)) <= 1.0)
    }
  }
}
