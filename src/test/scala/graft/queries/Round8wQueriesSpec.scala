package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-8 LM-smoothing/stylometry batch
  * at sf0.001 (exact values ride the DuckDB oracle gate at sf0.01).
  */
class Round8wQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round8wQueries.queries(name)(spark, sf0001)

  test("q_kneser_ney: probabilities in (0,1], counts consistent") {
    val rows = run("q_kneser_ney").collect()
    assert(rows.length == 20)
    val counts = rows.map(_.getLong(2))
    assert(counts.toSeq == counts.sortBy(-_).toSeq, "sorted by count desc")
    rows.foreach { r =>
      val (c, ctx, nf, np, nt) = (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))
      assert(c <= ctx && nf <= ctx && np <= nt)
      val p = r.getDouble(7)
      assert(p > 0.0 && p <= 1.0, s"p_kn $p")
    }
  }

  test("q_good_turing: count-of-counts decreasing-ish, unseen mass sane") {
    val rows = run("q_good_turing").collect()
    assert(rows.nonEmpty)
    val r1 = rows.find(_.getLong(0) == 1).get
    // Zipfian corpora have the largest type class at r=1
    assert(rows.forall(_.getLong(1) <= r1.getLong(1)))
    val p0 = r1.getDouble(6)
    assert(p0 > 0.0 && p0 < 1.0)
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0.0) // r_star
      assert(r.getLong(1) > 0)
    }
  }

  test("q_burrows_delta: all source pairs, nonnegative symmetric-form") {
    val rows = run("q_burrows_delta").collect()
    // 20 sources -> 190 unordered pairs
    assert(rows.length == 190)
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      assert(r.getLong(2) == 30)
      assert(r.getDouble(3) >= 0.0)
    }
    // not all deltas identical (the measure actually discriminates)
    assert(rows.map(_.getDouble(3)).distinct.length > 1)
  }
}
