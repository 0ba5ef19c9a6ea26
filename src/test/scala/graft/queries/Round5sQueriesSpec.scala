package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-5s corpus-curation batch at
  * sf0.001 (exact values are covered by the DuckDB oracle gate).
  */
class Round5sQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round5sQueries.queries(name)(spark, sf0001)

  test("q_rake_keywords: phrases exclude stopwords, scores descend") {
    val rows = run("q_rake_keywords").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val stop = Set("the", "of", "and", "a", "to", "in", "is", "on",
      "for", "with", "as", "by", "an", "be", "at")
    rows.foreach { r =>
      val words = r.getString(1).split(" ")
      assert(words.length == r.getLong(2))
      words.foreach(w => assert(!stop.contains(w), s"stopword in '$r'"))
      // RAKE scores are at least the phrase length (deg/freq >= 1)
      assert(r.getDouble(3) >= r.getLong(2) - 1e-9)
    }
    val scores = rows.map(_.getDouble(3))
    assert(scores.zip(scores.tail).forall { case (x, y) => x >= y })
  }

  test("q_centroid_shift: cosine bounded, split counts partition label") {
    val rows = run("q_centroid_shift").collect()
    assert(rows.nonEmpty)
    val byLabel = graft.Tables(spark, sf0001, "embeddings")
      .groupBy("label").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) == byLabel(r.getInt(0)))
      val c = r.getDouble(3)
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
    }
  }

  test("q_budget_alloc: never over capacity, near-exact spend") {
    val rows = run("q_budget_alloc").collect()
    assert(rows.nonEmpty)
    var spent = 0L
    rows.foreach { r =>
      val (cap, a1, a2, fin) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(a1 >= 0 && a2 >= 0 && fin == a1 + a2)
      assert(fin <= cap)
      assert(r.getDouble(5) <= 1.0 + 1e-9)
      spent += fin
    }
    val capTotal = rows.map(_.getLong(1)).sum
    val target = capTotal / 2
    assert(spent <= target)
    // when no source hit its capacity in pass 2, the only loss is the
    // per-source integer floor: under-spend < n_sources
    val uncapped = rows.forall(r =>
      r.getLong(3) < r.getLong(1) - r.getLong(2) || r.getLong(1) == r.getLong(2))
    if (uncapped) assert(spent >= target - rows.length)
  }
}
