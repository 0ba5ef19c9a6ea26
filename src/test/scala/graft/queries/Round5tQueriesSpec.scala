package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-5t event-economics batch at
  * sf0.001 (exact values are covered by the DuckDB oracle gate).
  */
class Round5tQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round5tQueries.queries(name)(spark, sf0001)

  test("q_time_weighted_avg: integral consistent with its parts") {
    val rows = run("q_time_weighted_avg").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, dwell, wsum, twa) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(n > 0 && dwell >= 0)
      assert(math.abs(twa - wsum.toDouble / dwell) < 1e-12)
    }
  }

  test("q_bitmap_intersect: bitmap algebra equals set ground truth") {
    val rows = run("q_bitmap_intersect").collect()
    assert(rows.nonEmpty)
    // independent ground truth via distinct sets in-memory
    val du = graft.Tables(spark, sf0001, "events")
      .select("event_type", "user_id").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byType = du.groupBy(_._1).map { case (t, xs) =>
      t -> xs.map(_._2).toSet
    }
    rows.foreach { r =>
      val (ta, tb) = (r.getString(0), r.getString(1))
      assert(ta < tb)
      assert(r.getLong(2) == byType(ta).size)
      assert(r.getLong(3) == byType(tb).size)
      assert(r.getLong(4) == (byType(ta) & byType(tb)).size)
    }
  }

  test("q_linear_attribution: credits bounded by purchase totals") {
    val rows = run("q_linear_attribution").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(math.abs(r.getDouble(3) -
        r.getLong(2).toDouble / 1e6) < 1e-12)
    }
    // total credited value can never exceed total purchase value
    // (floor quantization + unattributed purchases only lose credit)
    val totalPurchases = graft.Tables(spark, sf0001, "events")
      .filter("event_type = 'purchase'")
      .agg(org.apache.spark.sql.functions.sum("value"))
      .collect()(0).getDouble(0)
    val credited = rows.map(_.getDouble(3)).sum
    assert(credited <= totalPurchases + 1e-6)
  }
}
