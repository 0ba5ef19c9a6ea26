package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-5u association/LM batch at
  * sf0.001, plus the accuracy bound for q_approx_percentile (whose
  * oracle row hash-verifies the rank-guarantee BOOLEANS; the value-level
  * accuracy of the underlying estimates is pinned here).
  */
class Round5uQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round5uQueries.queries(name)(spark, sf0001)

  test("q_basket_lift: supports consistent, ordering correct") {
    val rows = run("q_basket_lift").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      val (cab, ca, cb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(cab >= 3 && cab <= math.min(ca, cb))
      assert(r.getDouble(5) > 0.0)
    }
    val lifts = rows.map(_.getDouble(5))
    assert(lifts.zip(lifts.tail).forall { case (x, y) => x >= y })
  }

  test("q_ngram_lm_next: probabilities ranked and bounded") {
    val rows = run("q_ngram_lm_next").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, g) =>
      val sorted = g.sortBy(_.getInt(4))
      assert(sorted.map(_.getInt(4)).toSeq == (1 to g.length))
      // rank order matches count order
      val counts = sorted.map(_.getLong(2))
      assert(counts.zip(counts.tail).forall { case (x, y) => x >= y })
      g.foreach { r =>
        val p = r.getDouble(5)
        assert(p > 0.0 && p <= 1.0)
        assert(r.getLong(2) <= r.getLong(3))
      }
      // top-3 mass per token can't exceed 1
      assert(g.map(_.getDouble(5)).sum <= 1.0 + 1e-9)
    }
  }

  test("q_approx_percentile: bound booleans true and honest") {
    val rows = run("q_approx_percentile").collect()
    assert(rows.nonEmpty)
    // the query now EMITS the rank-guarantee booleans (hash-verified by
    // the oracle); this spec re-derives the underlying estimates and
    // checks the booleans are true because the rank bound really holds
    val data = graft.Tables(spark, sf0001, "lineitem")
      .select("l_returnflag", "l_extendedprice").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted }
    val ests = graft.Tables(spark, sf0001, "lineitem")
      .groupBy("l_returnflag")
      .agg(org.apache.spark.sql.functions.expr(
        "approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99), 1000)")
        .as("ps"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    rows.foreach { r =>
      val flag = r.getString(0)
      val xs = data(flag)
      val n = xs.length
      assert(r.getLong(1) == n)
      assert(r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4),
        s"$flag: query reports an estimate out of its rank band")
      Seq(0.5, 0.9, 0.99).zip(ests(flag)).foreach { case (q, est) =>
        val rank = xs.count(_ <= est)
        val target = q * n
        assert(math.abs(rank - target) <= n / 1000.0 + 1.0 + 1e-9,
          s"$flag p$q: est $est has rank $rank, target $target, n=$n")
      }
    }
  }
}
