package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-5d TPC-H-completion /
  * table-maintenance batch at sf0.001 (exact values are covered by the
  * DuckDB oracle gate).
  */
class Round5dQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round5dQueries.queries(name)(spark, sf0001)

  test("q_tpch_q1: aggregate identities hold per group") {
    val rows = run("q_tpch_q1").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (sumQty, sumBase, sumDisc, sumCharge) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      val (avgQty, avgPrice, n) =
        (r.getDouble(6), r.getDouble(7), r.getLong(9))
      assert(n > 0)
      // discount in [0, 0.1], tax in [0, 0.08]
      assert(sumDisc <= sumBase && sumDisc >= sumBase * 0.89)
      assert(sumCharge >= sumDisc && sumCharge <= sumDisc * 1.09)
      assert(math.abs(avgQty - sumQty / n) < 1e-9)
      assert(math.abs(avgPrice - sumBase / n) < 1e-6)
    }
  }

  test("q_table_profile: one row per column, bounds hold") {
    val rows = run("q_table_profile").collect()
    assert(rows.length == 6)
    val n = rows.head.getLong(1)
    rows.foreach { r =>
      assert(r.getLong(1) == n)
      assert(r.getLong(2) >= 0 && r.getLong(2) <= n)      // nulls
      assert(r.getLong(3) >= 1 && r.getLong(3) <= n)      // distinct
    }
    // key column of the synthetic orders table is unique
    val keyRow = rows.find(_.getString(0) == "o_orderkey").get
    assert(keyRow.getLong(3) == n - keyRow.getLong(2))
  }

  test("q_table_checksum: stable across runs and row order") {
    val a = run("q_table_checksum").collect()
    assert(a.nonEmpty)
    // independent run (fresh plan, different task scheduling) agrees
    val b = run("q_table_checksum").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    // group counts sum to the table size
    val total = graft.Tables(spark, sf0001, "orders").count()
    assert(a.map(_.getLong(1)).sum == total)
  }

  test("q_compaction_plan: bins cover disjoint file ranges, sizes bounded") {
    val rows = run("q_compaction_plan").collect()
    assert(rows.nonEmpty)
    val total = graft.Tables(spark, sf0001, "lineitem").count()
    assert(rows.map(_.getLong(2)).sum == total)
    // file-id ranges are disjoint and ordered across bins
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(4) < b.getLong(3))
      case _ =>
    }
    // greedy fit: every bin except possibly the last stops only once
    // the target is reached, so bin totals are < target + max file size
    val maxFile = rows.map(_.getLong(2)).max
    rows.foreach(r => assert(r.getLong(2) < 2000L + maxFile))
  }
}
