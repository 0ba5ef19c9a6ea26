package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-5k Spark-4-surface/operational
  * batch at sf0.001 (exact values are covered by the DuckDB oracle).
  */
class Round5kQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round5kQueries.queries(name)(spark, sf0001)

  test("q_variant_funcs: typed paths extract; missing path is null") {
    val rows = run("q_variant_funcs").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0) // n
      assert(r.getLong(3) <= r.getLong(4)) // min_k <= max_k
      assert(r.getLong(5) == 0L) // '$.missing' never materializes
    }
  }

  test("q_pipe_syntax equals the classic SQL formulation") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    val piped = run("q_pipe_syntax").collect()
    val classic = graft.Tables(spark, sf0001, "lineitem")
      .filter(col("l_quantity") >= 10)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2)))
          .cast("double").as("revenue"))
      .orderBy("l_returnflag", "l_linestatus")
      .collect()
    assert(piped.length == classic.length)
    piped.zip(classic).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0) &&
        a.getString(1) == b.getString(1) &&
        a.getLong(2) == b.getLong(2) && a.getDouble(3) == b.getDouble(3))
    }
  }

  test("q_ivm_net_state: maintained always equals the full recompute") {
    val rows = run("q_ivm_net_state").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) == r.getLong(1) + r.getLong(2)) // maintained
      assert(r.getLong(3) == r.getLong(4), // == full recompute
        s"user ${r.getLong(0)}: maintained ${r.getLong(3)} != full ${r.getLong(4)}")
    }
    // the split is real: some user has activity on both sides
    assert(rows.exists(r => r.getLong(1) != 0 && r.getLong(2) != 0))
  }

  test("q_share_of_parent: shares nest multiplicatively") {
    val rows = run("q_share_of_parent").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, cells) =>
      assert(cells.map(_.getLong(2)).sum == cells.head.getLong(3))
      val s = cells.map(_.getDouble(5)).sum
      assert(math.abs(s - 1.0) < 1e-9)
    }
    rows.foreach(r =>
      assert(r.getDouble(5) == r.getLong(2).toDouble / r.getLong(3)))
  }

  test("q_debounce: kept + suppressed = events; kept never exceeds") {
    val rows = run("q_debounce").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3))
      assert(r.getLong(2) <= r.getLong(1) && r.getLong(2) > 0)
    }
  }
}
