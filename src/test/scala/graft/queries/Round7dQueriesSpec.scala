package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-7 sequential/temporal batch at
  * sf0.001 (exact values are covered by the DuckDB oracle gate).
  */
class Round7dQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round7dQueries.queries(name)(spark, sf0001)

  test("q_interval_coverage: union length never exceeds naive sum") {
    val rows = run("q_interval_coverage").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, covered) = (r.getLong(1), r.getLong(2))
      assert(covered <= n * 300000000L, "coverage must dedup overlap")
      assert(covered >= 300000000L, "at least one interval's span")
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
    }
    val cov = rows.map(_.getLong(2))
    assert(cov.zip(cov.tail).forall { case (a, b) => a >= b },
      "sorted by coverage desc")
  }

  test("q_runs_test: runs bounded by 1..n, sides partition the days") {
    val r = run("q_runs_test").collect().head
    val (n, a, b, runs) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(a + b == n)
    assert(runs >= 1 && runs <= n)
    // mu = 1 + 2ab/n always lies in [1, n]
    assert(r.getDouble(4) >= 1.0 && r.getDouble(4) <= n.toDouble)
  }

  test("q_max_drawdown: drawdown non-negative and below the peak") {
    val rows = run("q_max_drawdown").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= 0)
      assert(r.getLong(2) <= r.getLong(3),
        "drawdown cannot exceed the peak itself")
    }
  }

  test("q_streak_days: streaks positive, sorted desc") {
    val rows = run("q_streak_days").collect()
    assert(rows.nonEmpty)
    val st = rows.map(_.getLong(1))
    assert(st.forall(_ >= 1))
    assert(st.zip(st.tail).forall { case (a, b) => a >= b })
  }

  test("q_rank_movers: ranks positive, delta consistent") {
    val rows = run("q_rank_movers").collect()
    rows.foreach { r =>
      val (prev, cur, delta) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(prev >= 1 && cur >= 1)
      assert(delta == prev - cur)
    }
    val d = rows.map(r => math.abs(r.getLong(4)))
    assert(d.zip(d.tail).forall { case (a, b) => a >= b })
  }

  test("q_new_repeat_revenue: first week is all-new, shares in [0,1]") {
    val rows = run("q_new_repeat_revenue").collect()
    assert(rows.nonEmpty)
    val first = rows.head
    assert(first.getLong(4) == 0, "no repeat orders before any first order")
    rows.foreach { r =>
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
    }
  }
}
