package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-5r sequential-model batch at
  * sf0.001 (exact values are covered by the DuckDB oracle gate).
  */
class Round5rQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round5rQueries.queries(name)(spark, sf0001)

  test("q_holt_linear: forecast = level + trend, level near the data") {
    val rows = run("q_holt_linear").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (level, trend, fc) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(fc == level + trend)
      assert(level > 0.0) // counts are positive, smoothing stays positive
    }
  }

  test("q_cusum_drift: excursions bounded and consistent") {
    val rows = run("q_cusum_drift").collect()
    assert(rows.length == 1)
    val r = rows.head
    val (n, target, fin, mx) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(n > 0 && target >= 0)
    assert(fin >= 0 && mx >= fin)
  }

  test("q_ab_test_z: splits partition users, proportions in [0,1]") {
    val rows = run("q_ab_test_z").collect()
    assert(rows.length == 1)
    val r = rows.head
    val nUsers = graft.Tables(spark, sf0001, "events")
      .select("user_id").distinct().count()
    assert(r.getLong(0) + r.getLong(2) == nUsers)
    assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
    // z is NULL exactly when the pooled variance degenerates
    val degenerate = {
      val conv = r.getLong(1) + r.getLong(3)
      conv == 0 || conv == r.getLong(0) + r.getLong(2)
    }
    assert(r.isNullAt(6) == degenerate)
  }

  test("q_jaccard_neighbors: candidates are non-edges with valid scores") {
    val rows = run("q_jaccard_neighbors").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getLong(0) % 100 == 0) // u is a seed
      assert(r.getLong(0) != r.getLong(1))
      val j = r.getDouble(3)
      assert(j > 0.0 && j <= 1.0)
    }
    // descending by jaccard
    val js = rows.map(_.getDouble(3))
    assert(js.zip(js.tail).forall { case (x, y) => x >= y })
  }

  test("q_null_skew_join: routed union equals the plain left join") {
    val rows = run("q_null_skew_join").collect()
    assert(rows.nonEmpty)
    // the null-nation bucket holds exactly the nulled-FK orders
    val nullBucket = rows.filter(_.isNullAt(0))
    assert(nullBucket.length == 1)
    val expectedNull = spark.read.parquet(s"$sf0001/orders.parquet")
      .filter("o_custkey % 10 = 0").count()
    assert(nullBucket.head.getLong(1) == expectedNull)
    // grand total preserved — no row lost or duplicated by the routing
    val total = rows.map(_.getLong(1)).sum
    assert(total ==
      spark.read.parquet(s"$sf0001/orders.parquet").count())
  }
}
