package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-5m normalization/eval/temporal
  * batch at sf0.001 (exact values are covered by the DuckDB oracle).
  */
class Round5mQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round5mQueries.queries(name)(spark, sf0001)

  test("dedup_normalized: at least as coarse as exact dedup") {
    val rows = run("dedup_normalized").collect()
    val nDocs = graft.Tables(spark, sf0001, "documents").count()
    // clusters partition the corpus
    assert(rows.map(_.getLong(1)).sum == nDocs)
    // normalized clusters can only merge exact clusters, never split:
    // member count >= distinct raw-hash count per cluster
    rows.foreach(r => assert(r.getLong(1) >= r.getLong(2)))
  }

  test("q_langid_confusion: rows partition actuals; shares sum to 1") {
    val rows = run("q_langid_confusion").collect()
    assert(rows.nonEmpty)
    val nDocs = graft.Tables(spark, sf0001, "documents").count()
    assert(rows.map(_.getLong(2)).sum == nDocs)
    rows.groupBy(_.getString(0)).foreach { case (_, cells) =>
      assert(cells.map(_.getLong(2)).sum == cells.head.getLong(3))
      assert(math.abs(cells.map(_.getDouble(4)).sum - 1.0) < 1e-9)
    }
  }

  test("q_date_spine: 365 days of 1995, dow cycles, facts covered") {
    val rows = run("q_date_spine").collect()
    assert(rows.length == 365) // 1995 is not a leap year
    assert(rows.forall(_.getInt(1) == 1995))
    // Jan 1 1995 was a Sunday: epoch-day formula must say dow = 0
    assert(rows.head.getInt(5) == 0)
    // consecutive days advance dow mod 7
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getInt(5) == (a.getInt(5) + 1) % 7)
    }
    // every order lands on some spine day (zero-fill means no loss)
    val totalOrders = rows.map(_.getLong(6)).sum
    val inYear = graft.Tables(spark, sf0001, "orders")
      .filter(org.apache.spark.sql.functions.year(
        org.apache.spark.sql.functions.col("o_orderdate")) === 1995)
      .count()
    assert(totalOrders == inYear)
  }

  test("q_scd2_asof_counts: probes ordered, users bounded by actives") {
    val rows = run("q_scd2_asof_counts").collect()
    assert(rows.length == 3)
    val probes = rows.map(_.getLong(0))
    assert(probes.sameElements(probes.sorted))
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1)) // users <= active versions
      assert(r.getLong(2) > 0)
    }
  }
}
