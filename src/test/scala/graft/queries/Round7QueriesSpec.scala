package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-7 planning/mining batch at
  * sf0.001 (exact values are covered by the DuckDB oracle gate).
  */
class Round7QueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round7Queries.queries(name)(spark, sf0001)

  test("curriculum_phase: 4 balanced phases per language") {
    val rows = run("curriculum_phase").collect()
    assert(rows.nonEmpty)
    val byLang = rows.groupBy(_.getString(0))
    byLang.foreach { case (lang, rs) =>
      val phases = rs.map(_.getInt(1)).sorted
      assert(phases.forall(p => p >= 1 && p <= 4), s"$lang: $phases")
      // floor((rank-1)*4/n)+1 splits any n into quartiles within 1 doc
      val counts = rs.map(_.getLong(2))
      assert(counts.max - counts.min <= 1,
        s"$lang phases unbalanced: ${counts.mkString(",")}")
    }
  }

  test("q_token_mass_coverage: coverage is monotone in k and bounded") {
    val r = run("q_token_mass_coverage").collect().head
    val total = r.getLong(0)
    val (m10, m100, m1000) = (r.getLong(1), r.getLong(3), r.getLong(5))
    assert(0 < m10 && m10 <= m100 && m100 <= m1000 && m1000 <= total)
    val (s10, s100, s1000) = (r.getDouble(2), r.getDouble(4), r.getDouble(6))
    assert(s10 <= s100 && s100 <= s1000 && s1000 <= 1.0)
  }

  test("dedup_lsh_cost_audit: 4 bands, pair mass consistent with buckets") {
    val rows = run("dedup_lsh_cost_audit").collect()
    assert(rows.map(_.getInt(0)).sorted.toSeq == Seq(0, 1, 2, 3))
    rows.foreach { r =>
      val (nb, mx, pairs, singles) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(singles <= nb)
      assert(mx >= 1)
      // every candidate pair needs a bucket of size >= 2, and a band of
      // all-singleton buckets predicts exactly zero join work
      assert((pairs == 0) == (mx <= 1),
        s"band ${r.getInt(0)}: pairs=$pairs maxBucket=$mx")
      // max bucket alone already accounts for <= all predicted pairs
      assert(pairs >= mx * (mx - 1) / 2)
    }
  }

  test("q_session_paths: top-10 by frequency, ties by path") {
    val rows = run("q_session_paths").collect()
    assert(rows.length == 10)
    val counts = rows.map(_.getLong(1))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    assert(rows.forall(_.getString(0).nonEmpty))
  }

  test("multimodal_shard_manifest: 16 shards, balanced, bytes conserved") {
    val rows = run("multimodal_shard_manifest").collect()
    assert(rows.map(_.getInt(0)).sorted.toSeq == (0 until 16))
    val docs = rows.map(_.getLong(1))
    assert(docs.max - docs.min <= 1, s"doc counts: ${docs.mkString(",")}")
    // size-rank round-robin keeps every shard near 1/16 of the bytes
    rows.foreach { r =>
      val skew = r.getDouble(4)
      assert(skew > 0.5 && skew < 1.5, s"shard ${r.getInt(0)} skew $skew")
    }
    val sumBytes = rows.map(_.getLong(2)).sum
    val corpus = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("sum(octet_length(text))").collect().head.getLong(0)
    assert(sumBytes == corpus, s"bytes not conserved: $sumBytes vs $corpus")
  }

  test("q_dormant_reactivated: users bounded by reactivations, weeks ordered") {
    val rows = run("q_dormant_reactivated").collect()
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1),
        s"week ${r.getDate(0)}: users > reactivations")
    }
    val weeks = rows.map(_.getDate(0).toLocalDate)
    assert(weeks.zip(weeks.tail).forall { case (a, b) => a.isBefore(b) })
  }
}
