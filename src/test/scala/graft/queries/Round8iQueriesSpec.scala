package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-8 coreset/DP/salting batch at
  * sf0.001 (exact values ride the DuckDB oracle gate at sf0.01).
  */
class Round8iQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round8iQueries.queries(name)(spark, sf0001)

  test("q_coreset_weights: shares sum to 1, sensitivities bounded") {
    val rows = run("q_coreset_weights").collect()
    assert(rows.nonEmpty && rows.length <= 8)
    val shares = rows.map(_.getDouble(3))
    assert(shares.forall(s => s >= 0.0 && s <= 1.0))
    assert(math.abs(shares.sum - 1.0) < 1e-9,
      s"d2 shares sum to ${shares.sum}, not 1")
    rows.foreach { r =>
      // a cluster's max single-vector sensitivity cannot exceed the
      // cluster's whole share
      assert(r.getDouble(4) <= r.getDouble(3) + 1e-12)
      assert(r.getLong(1) > 0)
    }
  }

  test("q_dp_count_release: noisy = true + noise, deterministic draws") {
    val a = run("q_dp_count_release").collect()
    val b = run("q_dp_count_release").collect()
    assert(a.nonEmpty)
    // the release is a pure function of the source names
    assert(a.map(_.toString).sameElements(b.map(_.toString)))
    a.foreach { r =>
      val (cnt, noise, noisy) = (r.getLong(1), r.getDouble(2),
        r.getDouble(3))
      assert(cnt > 0)
      assert(math.abs(noisy - (cnt + noise)) < 1e-12)
      // Laplace(1) magnitude = -ln(u), u >= 2^-31: bounded by 31*ln2
      assert(math.abs(noise) <= 31 * math.log(2.0) + 1e-9)
    }
  }

  test("q_salt_plan: ceil-division plan, bounded max_after") {
    val rows = run("q_salt_plan").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { r =>
      val (c, salt, maxAfter, maxBefore, maxAfterAll) = (r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(salt == (c + 255) / 256)
      assert(maxAfter == (c + salt - 1) / salt)
      // after salting no split exceeds the 256-row target by more
      // than the ceil remainder
      assert(maxAfter <= 256 || salt == 1)
      assert(maxBefore >= c || r.getLong(0) > 1)
      assert(maxAfterAll <= 256 || maxBefore < 256)
    }
  }
}
