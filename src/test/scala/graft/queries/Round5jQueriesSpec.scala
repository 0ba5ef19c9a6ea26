package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-5j behavior/distribution batch at
  * sf0.001 (exact values are covered by the DuckDB oracle gate).
  */
class Round5jQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round5jQueries.queries(name)(spark, sf0001)

  test("q_markov_transition: rows are distributions over next states") {
    val rows = run("q_markov_transition").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, cells) =>
      // per-from counts sum to the shared from-total
      assert(cells.map(_.getLong(2)).sum == cells.head.getLong(3))
      val pSum = cells.map(_.getDouble(4)).sum
      assert(math.abs(pSum - 1.0) < 1e-9)
    }
    rows.foreach(r =>
      assert(r.getDouble(4) == r.getLong(2).toDouble / r.getLong(3)))
  }

  test("q_value_ecdf: monotone in the fence, ends at or below 1") {
    val rows = run("q_value_ecdf").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, cells) =>
      val byFence = cells.sortBy(_.getDouble(1))
      val es = byFence.map(_.getDouble(4))
      assert(es.zip(es.tail).forall { case (a, b) => a <= b })
      es.foreach(e => assert(e >= 0.0 && e <= 1.0))
    }
  }

  test("q_degree_dist: buckets bound their degrees, masses add up") {
    val rows = run("q_degree_dist").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getInt(0)
      val (lo, hi) = (r.getLong(3), r.getLong(4))
      // bucket k holds degrees in [2^k, 2^(k+1))
      assert(lo >= (1L << b) && hi < (1L << (b + 1)))
      assert(lo <= hi)
    }
    // total degree mass is twice the edge count (each edge adds 2)
    assert(rows.map(_.getLong(2)).sum % 2 == 0)
  }

  test("q_time_to_convert: non-negative lags, mean within [0, max]") {
    val r = run("q_time_to_convert").collect().head
    assert(r.getLong(0) > 0)
    assert(r.getLong(1) >= 0 && r.getLong(2) >= 0)
    val mean = r.getDouble(3)
    assert(mean >= 0.0 && mean <= r.getLong(2).toDouble)
    assert(mean == r.getLong(1).toDouble / r.getLong(0))
  }

  test("q_len_log2_hist: shares sum to 1, fences bound the bucket") {
    val rows = run("q_len_log2_hist").collect()
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_.getDouble(5)).sum - 1.0) < 1e-9)
    rows.foreach { r =>
      val b = r.getInt(0)
      assert(r.getLong(2) >= (1L << b) && r.getLong(3) < (1L << (b + 1)))
    }
    assert(rows.map(_.getLong(1)).sum == rows.head.getLong(4))
  }
}
