package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-8 privacy-audit batch at
  * sf0.001 (exact values ride the DuckDB oracle gate at sf0.01).
  */
class Round8yQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round8yQueries.queries(name)(spark, sf0001)

  test("q_k_anonymity: shares sum to one, census consistent") {
    val rows = run("q_k_anonymity").collect()
    assert(rows.nonEmpty)
    val shares = rows.map(_.getDouble(3)).sum
    assert(math.abs(shares - 1.0) < 1e-9, s"shares $shares")
    rows.foreach(r => assert(r.getLong(2) >= r.getLong(1),
      "rows >= classes in every band"))
  }

  test("q_l_diversity: l bounded by the 5 segments, shares sum to one") {
    val rows = run("q_l_diversity").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) >= 1 && r.getLong(0) <= 5)
    }
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-9)
  }

  test("q_generalization_tradeoff: coarser bands shrink classes & suppression") {
    val rows = run("q_generalization_tradeoff").collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("1_exact", "2_band_100", "3_band_1000"))
    val classes = rows.map(_.getLong(1))
    // generalizing can only merge classes
    assert(classes(0) >= classes(1) && classes(1) >= classes(2))
    val avg = rows.map(_.getDouble(5))
    assert(avg(0) <= avg(1) + 1e-9 && avg(1) <= avg(2) + 1e-9)
    rows.foreach { r =>
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
      assert(r.getLong(2) >= 1)
    }
  }
}
