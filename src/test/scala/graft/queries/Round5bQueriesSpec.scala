package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-5b corpus-assembly batch at
  * sf0.001 (exact values are covered by the DuckDB oracle gate).
  */
class Round5bQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round5bQueries.queries(name)(spark, sf0001)

  test("seq_pack_plan: windows cover the shard token stream exactly") {
    val rows = run("seq_pack_plan").collect()
    val n = graft.Tables(spark, sf0001, "documents").count()
    assert(rows.length == n)
    rows.foreach { r =>
      val tok = r.getLong(2); val first = r.getLong(3)
      val last = r.getLong(4); val spans = r.getLong(5)
      assert(tok >= 1 && first <= last && spans == last - first + 1)
      // a doc can span at most ceil(tok/512)+1 windows
      assert(spans <= tok / 512 + 2)
    }
    // per shard, pack ids never regress as doc_id grows and every
    // window boundary is adjacent (no skipped windows within a shard)
    rows.groupBy(_.getLong(1)).foreach { case (_, ds) =>
      val sorted = ds.sortBy(_.getLong(0))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(3) == a.getLong(4) ||
            b.getLong(3) == a.getLong(4) + 1)
        case _ =>
      }
    }
  }

  test("q_idf_surprisal: bounded by 1..n_docs, boilerplate scores low") {
    val rows = run("q_idf_surprisal").collect()
    val n = graft.Tables(spark, sf0001, "documents").count().toDouble
    assert(rows.length == n)
    rows.foreach { r =>
      val s = r.getDouble(2)
      // mean of n_docs/df with df in [1, n_docs]
      assert(s >= 1.0 - 1e-9 && s <= n + 1e-9)
    }
  }

  test("dedup_keep_best: one representative per fingerprint, best kept") {
    val kept = run("dedup_keep_best").collect()
    val fps = kept.map(_.getString(1))
    assert(fps.distinct.length == fps.length)
    val total = kept.map(_.getLong(2)).sum
    val n = graft.Tables(spark, sf0001, "documents").count()
    assert(total == n) // cluster sizes partition the corpus
  }

  test("sample_reservoir: at most 5 per group, ranks contiguous") {
    val rows = run("sample_reservoir").collect()
    assert(rows.nonEmpty)
    rows.groupBy(r => (r.getString(0), r.getString(1))).foreach {
      case (_, g) =>
        val rks = g.map(_.getInt(2)).sorted
        assert(rks.length <= 5 && rks.sameElements(1 to rks.length))
        // sample is deterministic: distinct docs
        val ids = g.map(_.getLong(3))
        assert(ids.distinct.length == ids.length)
    }
  }
}
