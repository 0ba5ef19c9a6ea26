package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-7 corpus-lifecycle batch at
  * sf0.001 (exact values are covered by the DuckDB oracle gate).
  */
class Round7bQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round7bQueries.queries(name)(spark, sf0001)

  test("dedup_incremental: classes partition the batch") {
    val rows = run("dedup_incremental").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, vsOld, within, kept) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(vsOld + within + kept == n,
        s"${r.getString(0)}: $vsOld + $within + $kept != $n")
      val rate = r.getDouble(5)
      assert(rate >= 0.0 && rate <= 1.0)
    }
  }

  test("quality_decile_dup: 10 deciles, dup counts bounded") {
    val rows = run("quality_decile_dup").collect()
    assert(rows.map(_.getInt(0)).sorted.toSeq == (1 to 10))
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
    // explicit floor formula balances deciles within one doc
    val counts = rows.map(_.getLong(1))
    assert(counts.max - counts.min <= 1)
  }

  test("decontam_token_mass: contaminated mass never exceeds the total") {
    val rows = run("decontam_token_mass").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(4) <= r.getLong(3))
      // a source with zero contaminated docs carries zero contaminated mass
      assert((r.getLong(2) == 0) == (r.getLong(4) == 0))
    }
  }

  test("dedup_span_coverage: shares in [0,1], every language present") {
    val rows = run("dedup_span_coverage").collect()
    assert(rows.length >= 2)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("vocab_marginal_gain: cumulative vocab is the running sum") {
    val rows = run("vocab_marginal_gain").collect()
    assert(rows.nonEmpty)
    var cum = 0L
    rows.foreach { r =>
      cum += r.getLong(1)
      assert(r.getLong(2) == cum, s"${r.getString(0)}: ${r.getLong(2)} != $cum")
    }
    // alphabetical source order
    val srcs = rows.map(_.getString(0))
    assert(srcs.sorted.toSeq == srcs.toSeq)
  }

  test("q_growth_accounting: classes partition weekly actives; week 1 all new") {
    val rows = run("q_growth_accounting").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) + r.getLong(4) == r.getLong(1))
    }
    val first = rows.head
    assert(first.getLong(2) == first.getLong(1),
      "every first-week active user must be 'new'")
  }
}
