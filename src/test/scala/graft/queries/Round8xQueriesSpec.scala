package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-8 shard-placement batch at
  * sf0.001 (exact values ride the DuckDB oracle gate at sf0.01).
  */
class Round8xQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round8xQueries.queries(name)(spark, sf0001)

  test("q_consistent_hash_ring: conservation and bounded movement") {
    val rows = run("q_consistent_hash_ring").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    val nb = rows.map(_.getLong(1)).sum
    val na = rows.map(_.getLong(2)).sum
    assert(nb == na, "every key assigned in both configs")
    // shard 4 exists only after the grow
    assert(rows(4).getLong(1) == 0 && rows(4).getLong(2) > 0)
    val moved = rows(0).getDouble(3)
    // the ring property: growth 4->5 moves FAR less than mod's ~4/5 —
    // expected ~1/5, allow generous noise at small n
    assert(moved > 0.0 && moved < 0.5, s"ring moved_frac $moved")
  }

  test("q_rebalance_matrix: mod reshard moves most keys") {
    val rows = run("q_rebalance_matrix").collect()
    val total = rows(0).getLong(3)
    assert(rows.map(_.getLong(2)).sum == total)
    val moved = rows(0).getDouble(4)
    // mod 4 -> mod 5 keeps only keys with h%20 in the 4-element
    // intersection pattern: ~1/5 stay, ~4/5 move
    assert(moved > 0.6, s"mod moved_frac $moved")
    rows.foreach(r => assert(r.getLong(0) < 4 && r.getLong(1) < 5))
  }

  test("q_shard_key_skew: 32 shards covered, imbalance ratio >= 1") {
    val rows = run("q_shard_key_skew").collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("l_orderkey", "l_partkey", "l_suppkey"))
    rows.foreach { r =>
      assert(r.getLong(1) <= 32)
      assert(r.getLong(3) >= r.getLong(4)) // max >= min
      assert(r.getDouble(5) >= 1.0 - 1e-9)
    }
  }
}
