package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-7 provenance/self-eval batch at
  * sf0.001 (exact values are covered by the DuckDB oracle gate; the
  * tiny SF has no exact duplicates, so dup-dependent fields are
  * asserted as consistent rather than positive).
  */
class Round7fQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round7fQueries.queries(name)(spark, sf0001)

  test("dedup_syndication: syndicated bounded by docs, rates consistent") {
    val rows = run("dedup_syndication").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(math.abs(r.getDouble(3) -
        r.getLong(2).toDouble / r.getLong(1)) < 1e-12)
    }
  }

  test("quality_compress_proxy: distinct grams bounded by total") {
    val rows = run("quality_compress_proxy").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("q_blocking_quality: both schemes audited, recall in [0,1]") {
    val rows = run("q_blocking_quality").collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      Seq("lang_source", "simhash_prefix"))
    val truthCounts = rows.map(_.getLong(3)).distinct
    assert(truthCounts.length == 1,
      "both schemes are scored against the same LSH truth set")
    rows.foreach { r =>
      assert(r.getLong(1) >= 1)                 // blocks
      assert(r.getLong(4) <= r.getLong(3))      // co_blocked <= truth
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
    }
  }

  test("q_user_feature_vector: counts partition events, span consistent") {
    val rows = run("q_user_feature_vector").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(1)
      assert(r.getLong(2) + r.getLong(3) + r.getLong(4) <= n,
        "typed counts cannot exceed the event count")
      assert(r.getLong(5) >= 1)                 // active days
      assert(r.getLong(6) <= r.getLong(7))      // first <= last
      assert(r.getDouble(9) >= 0.0 && r.getDouble(9) <= 1.0)
    }
  }

  test("corpus_summary_card: single consistent row") {
    val rows = run("corpus_summary_card").collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(0) > 0 && r.getLong(1) > 0)
    // clusters + dup docs account for every doc exactly
    assert(r.getLong(5) + r.getLong(6) == r.getLong(0),
      "n_clusters + n_dup_docs == n_docs")
    assert(r.getDouble(8) > 0.0)
  }
}
