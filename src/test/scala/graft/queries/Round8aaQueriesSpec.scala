package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-8 encoding-planner batch at
  * sf0.001 (exact values ride the DuckDB oracle gate at sf0.01).
  */
class Round8aaQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round8aaQueries.queries(name)(spark, sf0001)

  test("q_dict_encoding_plan: low-cardinality strings compress hard") {
    val rows = run("q_dict_encoding_plan").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (n, ndv, bits) = (r.getLong(1), r.getLong(2), r.getLong(4))
      assert(ndv <= n)
      // code width really is ceil(log2 ndv) (clamped to >= 1)
      assert((1L << bits) >= ndv && bits >= 1)
      assert(r.getDouble(6) > 1.0,
        s"${r.getString(0)} ratio ${r.getDouble(6)} should beat raw")
    }
  }

  test("q_bloom_size_plan: stricter FPP costs more bits") {
    val rows = run("q_bloom_size_plan").collect()
    assert(rows.length == 6)
    val byKey = rows.groupBy(_.getString(0))
    byKey.values.foreach { ks =>
      val sorted = ks.sortBy(_.getDouble(1))
      // fpp 0.001 needs ~1.5x the bits of 0.01
      assert(sorted(0).getLong(3) > sorted(1).getLong(3))
      assert(sorted(0).getLong(4) > sorted(1).getLong(4))
    }
    rows.foreach(r => assert(r.getDouble(5) > 0.0))
  }

  test("q_rle_runs: clustering can only create fewer-or-equal runs") {
    val rows = run("q_rle_runs").collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("1_arrival_order", "2_user_clustered"))
    val (arr, clu) = (rows(0), rows(1))
    assert(arr.getLong(1) == clu.getLong(1), "same row count")
    assert(arr.getLong(2) >= 1 && clu.getLong(2) >= 1)
    rows.foreach(r => assert(r.getDouble(3) >= 1.0))
  }
}
