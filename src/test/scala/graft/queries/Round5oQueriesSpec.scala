package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-5o graph-decomposition batch at
  * sf0.001 (exact values are covered by the DuckDB oracle gate).
  */
class Round5oQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round5oQueries.queries(name)(spark, sf0001)

  test("q_kcore_peel: monotone shrinkage across rounds") {
    val rows = run("q_kcore_peel").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    // peeling can only shrink the graph
    rows.sliding(2).foreach { case Array(p, n) =>
      assert(n.getLong(1) <= p.getLong(1)) // nodes
      assert(n.getLong(2) <= p.getLong(2)) // edges
    }
  }

  test("q_hits_bipartite: scores normalized, top authority maximal") {
    val rows = run("q_hits_bipartite").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val scores = rows.map(_.getLong(1))
    // rescale puts the max at exactly 1000; ordering is descending
    assert(scores.head == 1000L)
    assert(scores.sameElements(scores.sorted.reverse))
    scores.foreach(a => assert(a >= 0 && a <= 1000))
  }

  test("q_weekday_seasonality: 7 days, shares sum to 1") {
    val rows = run("q_weekday_seasonality").collect()
    assert(rows.length == 7)
    assert(rows.map(_.getInt(0)).toSeq == (0 to 6))
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-9)
    assert(rows.map(_.getLong(1)).sum == rows.head.getLong(3))
  }
}
