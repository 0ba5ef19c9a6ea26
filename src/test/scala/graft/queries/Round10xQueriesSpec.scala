package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-10 late batches (l onward) at
  * sf0.001 — exact values ride the DuckDB oracle gate at
  * sf0.01/sf0.001; these pin the properties a hash compare can't
  * express.
  */
class Round10xQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(m: Map[String, (org.apache.spark.sql.SparkSession,
    String) => org.apache.spark.sql.DataFrame], name: String) =
    m(name)(spark, sf0001)

  // ---- 10l: item-item co-occurrence ----------------------------------

  test("q_item_cooc: top pair support matches the brute-force count") {
    val rows = run(Round10lQueries.queries, "q_item_cooc").collect()
    assert(rows.nonEmpty)
    val top = rows.head
    // brute force on the collected basket list (sf0.001 is ~6k rows)
    val b = graft.Tables(spark, sf0001, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = b.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val pairCounts = scala.collection.mutable.Map[(Long, Long), Long]()
    byOrder.values.foreach { ps =>
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        pairCounts((ps(i), ps(j))) =
          pairCounts.getOrElse((ps(i), ps(j)), 0L) + 1L
    }
    val bruteMax = pairCounts.values.max
    assert(top.getLong(2) == bruteMax)
    assert(pairCounts((top.getLong(0), top.getLong(1))) == top.getLong(2))
    // descending support with (p_a, p_b) tie order
    val supports = rows.map(_.getLong(2))
    assert(supports.zip(supports.tail).forall { case (a, c) => a >= c })
  }

  test("q_item_cosine: cosine in (0, 1] and support bounded by item counts") {
    val rows = run(Round10lQueries.queries, "q_item_cosine").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (cooc, na, nb, cos) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(cooc >= 2 && cooc <= math.min(na, nb))
      assert(cos > 0.0 && cos <= 1.0)
      assert(cos == cooc.toDouble / math.sqrt((na * nb).toDouble))
    }
  }

  test("q_item_lift: lift equals its exact integer numerator/denominator") {
    val rows = run(Round10lQueries.queries, "q_item_lift").collect()
    rows.foreach { r =>
      val (cooc, num, den, lift) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(cooc >= 3)
      assert(lift == num.toDouble / den.toDouble)
      assert(num > 0 && den > 0)
    }
  }
}
