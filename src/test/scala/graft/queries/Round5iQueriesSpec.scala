package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-5i sketch/metadata batch at
  * sf0.001 (exact values are covered by the DuckDB oracle gate).
  */
class Round5iQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round5iQueries.queries(name)(spark, sf0001)

  test("q_cms_freq: CMS never underestimates; exact on light keys") {
    val rows = run("q_cms_freq").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      // the defining CMS property: estimate >= exact (collisions add)
      assert(r.getLong(1) >= r.getLong(2),
        s"user ${r.getLong(0)}: est ${r.getLong(1)} < exact ${r.getLong(2)}")
    }
    // at sf0.001 the user domain is small: some probes are live keys,
    // the rest are ghosts whose exact count is zero by definition
    assert(rows.exists(_.getLong(2) > 0))
  }

  test("q_source_overlap_matrix matches the brute-force matrix") {
    val docs = graft.Tables(spark, sf0001, "documents")
      .select(sha2(col("text"), 256).as("h"), col("source"))
      .collect().map(r => (r.getString(0), r.getString(1))).distinct
    val brute = docs.groupBy(_._1).values.toSeq
      .flatMap { members =>
        val srcs = members.map(_._2).distinct.sorted.toSeq
        for (a <- srcs; b <- srcs if a < b) yield (a, b)
      }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = run("q_source_overlap_matrix").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == brute)
  }

  test("decontam_fuzzy: pairs are cross-side and above threshold") {
    val rows = run("decontam_fuzzy").collect()
    rows.foreach { r =>
      assert(r.getLong(0) % 50 != 0, "corpus side leaked a bench doc")
      assert(r.getLong(1) % 50 == 0, "bench side leaked a corpus doc")
      assert(r.getDouble(2) >= 0.5)
    }
  }

  test("q_partition_prune_audit: fences bound the data, prune consistent") {
    val rows = run("q_partition_prune_audit").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lo, hi) = (r.getDouble(2), r.getDouble(3))
      assert(lo <= hi)
      assert(r.getBoolean(4) == (hi < 150000.0 || lo > 300000.0))
    }
    // months must be distinct and ascending
    val months = rows.map(_.getLong(0))
    assert(months.sameElements(months.distinct.sorted))
  }

  test("q_survivorship: every document lands in exactly one record") {
    val rows = run("q_survivorship").collect()
    val nDocs = graft.Tables(spark, sf0001, "documents").count()
    assert(rows.map(_.getLong(4)).sum == nDocs)
    rows.foreach { r =>
      // csv fields are sorted and non-empty
      val langs = r.getString(2).split(",")
      assert(langs.nonEmpty && langs.sameElements(langs.sorted))
      assert(r.getLong(1) > 0)
    }
  }
}
