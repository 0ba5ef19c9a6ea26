package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-8 entropy/tail/linkage batch at
  * sf0.001 (exact values ride the DuckDB oracle gate at sf0.01).
  */
class Round8lQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round8lQueries.queries(name)(spark, sf0001)

  test("q_ngram_entropy_rate: bounded by ln(alphabet), positive") {
    val r = run("q_ngram_entropy_rate").collect()(0)
    val (nTri, nPos, h) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(nTri > 0 && nPos >= nTri)
    // conditional entropy: 0 <= H(c3|c1c2) <= ln(#distinct chars);
    // the synthetic alphabet is ~27 symbols
    assert(h >= 0.0 && h <= math.log(64.0), s"entropy $h out of range")
  }

  test("q_hill_tail_index: positive alpha, x_k below the max length") {
    val r = run("q_hill_tail_index").collect()(0)
    val (k, xk, alpha) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(k == 50 && xk > 0)
    assert(alpha > 0.0, s"Hill alpha $alpha must be positive")
    // doc lengths are thin-tailed synthetic — alpha should be large
    // (power laws give alpha ~ 1-3; >3 means no heavy tail)
    assert(alpha > 1.0)
  }

  test("q_topk_shard_recall: recall in [0,1], shard counts bounded") {
    val rows = run("q_topk_shard_recall").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    assert(rows.map(_.getLong(0)).toSeq ==
      (1L to rows.length.toLong).toSeq)
    rows.foreach { r =>
      val (gc, nShards, merged, recall) = (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))
      assert(gc > 0)
      assert(nShards >= 0 && nShards <= 8)
      // the merge can only undercount: local lists are subsets
      assert(merged >= 0 && merged <= gc)
      assert(recall >= 0.0 && recall <= 1.0)
      if (nShards == 0) assert(merged == 0)
    }
  }
}
