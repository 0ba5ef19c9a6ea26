package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-5e embedding-maintenance batch at
  * sf0.001 (exact values are covered by the DuckDB oracle gate).
  */
class Round5eQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round5eQueries.queries(name)(spark, sf0001)

  test("q_embedding_quantize: 64 dims, ranges sane, scale consistent") {
    val rows = run("q_embedding_quantize").collect()
    assert(rows.map(_.getInt(0)).toSeq == (0 until 64))
    val n = rows.head.getLong(1)
    rows.foreach { r =>
      assert(r.getLong(1) == n)
      val (lo, hi, scale) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(lo <= hi)
      assert(scale == (hi - lo) / 255)
    }
  }

  test("q_dead_dims: counts bounded, gate matches the cross-multiply") {
    val rows = run("q_dead_dims").collect()
    assert(rows.length == 64)
    rows.foreach { r =>
      val (n, nSmall, maxAbs) =
        (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nSmall >= 0 && nSmall <= n && maxAbs >= 0.0)
      assert(r.getBoolean(4) == (nSmall * 20 > n * 19))
    }
  }

  test("q_label_balance: shares sum to 1, deviations exact") {
    val rows = run("q_label_balance").collect()
    assert(rows.nonEmpty)
    val total = rows.head.getLong(2)
    val k = rows.head.getLong(3)
    assert(rows.length == k)
    assert(rows.map(_.getLong(1)).sum == total)
    rows.foreach { r =>
      assert(r.getLong(4) == math.abs(r.getLong(1) * k - total))
      assert(r.getDouble(5) == r.getLong(1).toDouble / total)
    }
  }

  test("dedup_cluster_hist: doc counts reconcile with the corpus") {
    val rows = run("dedup_cluster_hist").collect()
    assert(rows.nonEmpty)
    val total = graft.Tables(spark, sf0001, "documents").count()
    rows.foreach(r => assert(r.getLong(2) == r.getLong(0) * r.getLong(1)))
    assert(rows.map(_.getLong(2)).sum == total)
  }
}
