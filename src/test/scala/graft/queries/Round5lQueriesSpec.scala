package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-5l evaluation/planning batch at
  * sf0.001 (exact values are covered by the DuckDB oracle gate).
  */
class Round5lQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round5lQueries.queries(name)(spark, sf0001)

  test("q_cluster_purity: purity well-formed, members partition vecs") {
    val rows = run("q_cluster_purity").collect()
    assert(rows.nonEmpty)
    val nVecs = graft.Tables(spark, sf0001, "embeddings").count()
    assert(rows.map(_.getLong(1)).sum == nVecs)
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(1)) // majority <= members
      val p = r.getDouble(5)
      assert(p > 0.0 && p <= 1.0)
      assert(p == r.getLong(3).toDouble / r.getLong(1))
      // a single-label cluster must be perfectly pure
      if (r.getLong(4) == 1) assert(p == 1.0)
    }
  }

  test("q_join_size_audit: the Σc² prediction IS the join size") {
    val r = run("q_join_size_audit").collect().head
    assert(r.getLong(0) == r.getLong(1),
      s"predicted ${r.getLong(0)} != actual ${r.getLong(1)}")
    assert(r.getLong(3) <= r.getLong(0))
    assert(r.getDouble(4) == r.getLong(3).toDouble / r.getLong(0))
  }
}
