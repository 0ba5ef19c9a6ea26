package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-9 Selinger-DP batch at sf0.001
  * (exact values ride the DuckDB oracle gate at sf0.01).
  */
class Round9gQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round9gQueries.queries(name)(spark, sf0001)

  test("q_join_order_dp: optimum never exceeds the left-deep chain") {
    val r = run("q_join_order_dp").collect()(0)
    val (n, opt, ld, gain) =
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(n == 31)
    assert(opt > 0.0)
    // the left-deep chain is one of the plans the DP enumerates
    assert(opt <= ld, s"DP optimum $opt must be <= left-deep $ld")
    assert(math.abs(gain - ld / opt) < 1e-12)
    assert(gain >= 1.0)
  }

  test("q_cost_model_validate: q-error >= 1, single-relation est exact") {
    val rows = run("q_cost_model_validate").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 3, 7, 15, 31))
    rows.foreach { r =>
      assert(r.getDouble(3) >= 1.0 - 1e-12) // q-error is >= 1 by def
      assert(r.getLong(1) >= 0)
    }
    // est(single relation) = its cardinality — exactly
    val base = rows.find(_.getInt(0) == 1).get
    assert(math.abs(base.getDouble(2) - base.getLong(1).toDouble) < 1e-9)
    assert(math.abs(base.getDouble(3) - 1.0) < 1e-12)
  }

  test("q_join_graph_stats: 8 rows, skew >= 1, FK sides have ndv = n") {
    val rows = run("q_join_graph_stats").collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      val (ndv, n, mx) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(ndv <= n && mx >= 1)
      // skew = max * ndv / n >= 1 because max >= n / ndv (pigeonhole)
      assert(r.getDouble(5) >= 1.0 - 1e-12)
    }
    // primary-key sides are unique: customer.c_custkey, part.p_partkey,
    // supplier.s_suppkey, orders.o_orderkey
    def row(edge: String, side: String) =
      rows.find(r => r.getString(0) == edge && r.getString(1) == side).get
    assert(row("c_o", "left").getLong(2) == row("c_o", "left").getLong(3))
    assert(row("l_p", "right").getLong(2) == row("l_p", "right").getLong(3))
    assert(row("l_s", "right").getLong(2) == row("l_s", "right").getLong(3))
    assert(row("o_l", "left").getLong(2) == row("o_l", "left").getLong(3))
  }

  test("dp cost of the full set uses only connected cross-edge splits") {
    // C (1) and P (8) share no edge: their pair must never appear — so
    // dp over {C,P} alone is impossible and est({C,P}) is never a DP
    // state. Indirect check: the DP still reaches mask 31 (connected
    // via L), and every prefix mask the validator uses is connected.
    val r = run("q_join_order_dp").collect()(0)
    assert(r.getDouble(1) > 0.0 && !r.getDouble(1).isNaN)
  }
}
