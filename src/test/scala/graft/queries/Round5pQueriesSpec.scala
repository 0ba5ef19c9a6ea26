package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-5p distribution-diagnostics batch
  * at sf0.001 (exact values are covered by the DuckDB oracle gate).
  */
class Round5pQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round5pQueries.queries(name)(spark, sf0001)

  test("q_ks_split: one row, D in [0,1], split covers the corpus") {
    val rows = run("q_ks_split").collect()
    assert(rows.length == 1)
    val r = rows.head
    val (na, nb, d) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(na > 0 && nb > 0)
    assert(d >= 0.0 && d <= 1.0)
    val nDocs = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(na + nb == nDocs)
  }

  test("q_benford_audit: shares sum to 1, benford column is the law") {
    val rows = run("q_benford_audit").collect()
    assert(rows.nonEmpty && rows.length <= 9)
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-9)
    rows.foreach { r =>
      val d = r.getString(0).toInt
      assert(d >= 1 && d <= 9)
      assert(math.abs(r.getDouble(3) - math.log10(1.0 + 1.0 / d)) < 1e-15)
      assert(math.abs(r.getDouble(4) -
        math.abs(r.getDouble(2) - r.getDouble(3))) < 1e-15)
    }
  }

  test("q_gini_doclen: per source, gini in [0,1)") {
    val rows = run("q_gini_doclen").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      val g = r.getDouble(2)
      assert(g >= 0.0 && g < 1.0, s"gini out of range: $g")
    }
  }

  test("q_source_diversity: impurity bounds vs language count") {
    val rows = run("q_source_diversity").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val k = r.getLong(1)
      val maj = r.getDouble(2)
      val imp = r.getDouble(3)
      assert(maj > 0.0 && maj <= 1.0)
      // impurity is 0 iff one lang; bounded by 1 - 1/k (uniform mix)
      assert(imp >= -1e-12 && imp <= 1.0 - 1.0 / k + 1e-12)
      if (k == 1) assert(math.abs(imp) < 1e-12)
    }
  }

  test("q_bfs_hops: visited grows by exactly the new frontier") {
    val rows = run("q_bfs_hops").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    val seeds = spark.read.parquet(s"$sf0001/part.parquet")
      .filter("p_partkey % 100 = 0").count()
    var visited = seeds
    rows.foreach { r =>
      visited += r.getLong(1)
      assert(r.getLong(2) == visited)
    }
  }
}
