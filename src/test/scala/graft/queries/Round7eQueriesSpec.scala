package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-7 stats/matching batch at
  * sf0.001 (exact values are covered by the DuckDB oracle gate).
  */
class Round7eQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round7eQueries.queries(name)(spark, sf0001)

  test("q_equi_depth_hist: 16 near-equal buckets with ordered boundaries") {
    val rows = run("q_equi_depth_hist").collect()
    assert(rows.map(_.getInt(0)).sorted.toSeq == (0 until 16))
    val counts = rows.map(_.getLong(1))
    assert(counts.max - counts.min <= 1, "equi-depth means equal counts")
    // boundaries are non-decreasing across buckets
    val sorted = rows.sortBy(_.getInt(0))
    sorted.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(3) <= b.getLong(2) || a.getLong(3) <= b.getLong(3))
    }
    sorted.foreach(r => assert(r.getLong(2) <= r.getLong(3)))
  }

  test("q_stats_collect: one row per key column, sane bounds") {
    val rows = run("q_stats_collect").collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      Seq("l_linenumber", "l_orderkey", "l_partkey", "l_suppkey"))
    rows.foreach { r =>
      assert(r.getLong(1) >= 1)            // ndv
      assert(r.getLong(2) == 0)            // no nulls in keys
      assert(r.getLong(3) <= r.getLong(4)) // min <= max
    }
  }

  test("q_mutual_best_match: pairs are ordered and reciprocal by construction") {
    val rows = run("q_mutual_best_match").collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= -1.0 && r.getDouble(2) <= 1.0 + 1e-9)
    }
    // each vector appears in at most one mutual pair per side
    val ids = rows.flatMap(r => Seq(r.getLong(0), r.getLong(1)))
    assert(ids.distinct.length == ids.length,
      "a vector has exactly one best match, so one mutual pair at most")
  }

  test("q_decay_weighted_revenue: decayed never exceeds raw revenue") {
    val rows = run("q_decay_weighted_revenue").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(2) >= 0)
    }
  }

  test("dedup_affix_overlap: no self pairs") {
    val rows = run("dedup_affix_overlap").collect()
    rows.foreach(r => assert(r.getLong(0) != r.getLong(1)))
  }

  test("q_funnel_latency: both steps present with positive medians") {
    val rows = run("q_funnel_latency").collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      Seq("click->purchase", "view->click"))
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getLong(2) > 0, "latency after a strict > filter is positive")
    }
  }
}
