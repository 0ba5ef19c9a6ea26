package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-5h compaction/audit batch at
  * sf0.001 (exact values are covered by the DuckDB oracle gate).
  */
class Round5hQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round5hQueries.queries(name)(spark, sf0001)

  test("q_changelog_compact: classification is consistent") {
    val rows = run("q_changelog_compact").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (first, last, net) =
        (r.getString(1), r.getString(2), r.getString(3))
      net match {
        case "NONE" => assert(first == "I" && last == "D")
        case "I"    => assert(first == "I" && last != "D")
        case "D"    => assert(first != "I" && last == "D")
        case "+U"   => assert(first != "I" && last != "D")
        case other  => fail(s"unexpected net op $other")
      }
      assert(r.getLong(5) > 0)
    }
  }

  test("q_disorder_audit: counts nest (late ⊆ disordered ⊆ rows)") {
    val rows = run("q_disorder_audit").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1)) // disordered <= rows
      assert(r.getLong(3) <= r.getLong(2)) // late <= disordered
      if (r.getLong(2) == 0) assert(r.getLong(4) == 0)
      else assert(r.getLong(4) > 0)
    }
  }

  test("q_ngram_novelty: novel <= grams; first doc is fully novel") {
    val rows = run("q_ngram_novelty").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) == r.getLong(2).toDouble / r.getLong(1))
    }
    // the lowest doc_id with grams can only contain first occurrences
    val firstDoc = rows.minBy(_.getLong(0))
    assert(firstDoc.getLong(2) == firstDoc.getLong(1))
  }

  test("q_skyline equals the brute-force dominance filter") {
    val parts = graft.Tables(spark, sf0001, "part")
      .select("p_partkey", "p_retailprice", "p_size")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val brute = parts.filter { case (_, px, sx) =>
      !parts.exists { case (_, py, sy) =>
        py <= px && sy >= sx && (py < px || sy > sx)
      }
    }.map(_._1).toSet
    val got = run("q_skyline").collect().map(_.getLong(0)).toSet
    assert(got == brute)
  }

  test("q_split_bias_audit: cells sum to split totals, shares exact") {
    val rows = run("q_split_bias_audit").collect()
    assert(rows.nonEmpty)
    val bySplit = rows.groupBy(_.getString(0))
    bySplit.foreach { case (_, cells) =>
      assert(cells.map(_.getLong(2)).sum == cells.head.getLong(3))
    }
    rows.foreach { r =>
      assert(r.getLong(6) ==
        r.getLong(2) * r.getLong(5) - r.getLong(3) * r.getLong(4))
      assert(r.getDouble(7) == r.getLong(2).toDouble / r.getLong(3))
    }
  }
}
