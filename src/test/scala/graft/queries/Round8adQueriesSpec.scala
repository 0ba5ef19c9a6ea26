package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-8 fraud-screen batch at sf0.001
  * (exact values ride the DuckDB oracle gate at sf0.01).
  */
class Round8adQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round8adQueries.queries(name)(spark, sf0001)

  test("q_duplicate_payment: flagged orders consistent with pairs") {
    val r = run("q_duplicate_payment").collect()(0)
    val (pairs, sameDay, orders) =
      (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(sameDay <= pairs)
    if (pairs == 0) assert(orders == 0)
    // each pair implicates at most 2 new orders
    else assert(orders >= 2 && orders <= 2 * pairs)
    assert(r.getDouble(3) >= 0.0)
  }

  test("q_round_amount_bias: shares consistent, hundreds within dollars") {
    val rows = run("q_round_amount_bias").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("A", "N", "R"))
    rows.foreach { r =>
      val (n, wd, wh) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(wh <= wd && wd <= n)
      assert(math.abs(r.getDouble(4) - wd.toDouble / n) < 1e-12)
      assert(math.abs(r.getDouble(5) - r.getDouble(4) / 0.01) < 1e-9)
    }
  }

  test("q_velocity_flags: burst counters ordered") {
    val r = run("q_velocity_flags").collect()(0)
    val (users, mx, ge2, ge3) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(users > 0)
    assert(mx >= 1)
    assert(ge3 <= ge2 && ge2 <= users)
    if (mx < 2) assert(ge2 == 0)
    if (mx < 3) assert(ge3 == 0)
  }
}
