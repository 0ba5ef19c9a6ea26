package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-5 retrieval batch at sf0.001
  * (exact values are covered by the DuckDB oracle gate).
  */
class Round5QueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round5Queries.queries(name)(spark, sf0001)

  test("q_bm25_topk: descending positive scores, hits contain a query term") {
    val rows = run("q_bm25_topk").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val scores = rows.map(_.getDouble(1))
    assert(scores.forall(_ > 0.0))
    assert(scores.sameElements(scores.sorted(Ordering[Double].reverse)))
    val hitIds = rows.map(_.getLong(0)).toSet
    val withTerm = graft.Tables(spark, sf0001, "documents")
      .filter(col("text").rlike("\\b(hash|join|vector)\\b"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(hitIds.subsetOf(withTerm))
  }

  test("q_inverted_index: df<=N, cf>=df, postings ascending, head<=8") {
    val n = graft.Tables(spark, sf0001, "documents").count()
    val rows = run("q_inverted_index").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val df = r.getLong(1); val cf = r.getLong(2)
      assert(df >= 1 && df <= n)
      assert(cf >= df) // every posting contributes at least one occurrence
      val ids = r.getString(3).split(",").map(_.toLong)
      assert(ids.length <= 8 && ids.length == math.min(df, 8))
      assert(ids.sameElements(ids.sorted)) // smallest-8, ascending
    }
  }

  test("q_rrf_fusion: every row ranked by an arm, rrf bounded by 2/61") {
    val rows = run("q_rrf_fusion").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(!r.isNullAt(2) || !r.isNullAt(3)) // in lex or sem top-50
      val rrf = r.getDouble(1)
      assert(rrf > 0.0 && rrf <= 2.0 / 61 + 1e-15)
    }
    // a doc ranked #1 by both arms would score exactly 2/61; fused order
    // is descending
    val fused = rows.map(_.getDouble(1))
    assert(fused.sameElements(fused.sorted(Ordering[Double].reverse)))
  }

  test("q_temperature_mix: weights normalize to 1, tails upsampled") {
    val rows = run("q_temperature_mix").collect()
    val langs = rows.map(_.getString(0))
    assert(langs.sameElements(langs.sorted) && langs.distinct.length == langs.length)
    val n = rows.map(_.getLong(1)).sum.toDouble
    val weights = rows.map(_.getDouble(2))
    assert(math.abs(weights.sum - 1.0) < 1e-12)
    rows.foreach { r =>
      val share = r.getLong(1) / n
      val w = r.getDouble(2)
      // sqrt temperature: rare langs gain weight, the dominant one loses
      if (share < 1.0 / rows.length) assert(w > share)
      assert(r.getLong(3) >= 0 && r.getLong(3) <= r.getLong(1))
    }
  }

  test("bpe_apply: merges only ever shrink the token count") {
    val rows = run("bpe_apply").collect()
    val n = graft.Tables(spark, sf0001, "documents").count()
    assert(rows.length == n)
    rows.foreach { r =>
      val words = r.getLong(1); val chars = r.getLong(2)
      val tokens = r.getLong(3)
      assert(tokens <= chars)  // every merge reduces tokens by 1
      assert(tokens >= words)  // a word never drops below one token
    }
    // the top-3 merges must actually fire somewhere in the corpus
    assert(rows.exists(r => r.getLong(3) < r.getLong(2)))
  }
}
