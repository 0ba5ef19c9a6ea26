package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-8 planning-layer batch at
  * sf0.001 (exact values ride the DuckDB oracle gate at sf0.01).
  */
class Round8vQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round8vQueries.queries(name)(spark, sf0001)

  test("q_semijoin_program: reduction preserves the plain-join result") {
    val rows = run("q_semijoin_program").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getDouble(2) > 0.0)
    }
    // nation keys strictly ascending (total order mirrored in oracle)
    val keys = rows.map(_.getInt(0).toLong)
    assert(keys.toSeq == keys.sorted.toSeq)
  }

  test("q_cardinality_model_eval: q-error >= 1, PK-FK joins estimated well") {
    val rows = run("q_cardinality_model_eval").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getDouble(7) >= 1.0 - 1e-9, s"q_error ${r.getDouble(7)}")
      assert(r.getLong(6) > 0)
    }
    // FK joins against a true key side: containment makes the System-R
    // estimate exact, so q_error should be 1 for orders-customer
    val oc = rows.find(_.getString(0) == "orders-customer").get
    assert(math.abs(oc.getDouble(7) - 1.0) < 1e-6)
  }

  test("q_lookup_cache_plan: hit rate monotone in cache size") {
    val rows = run("q_lookup_cache_plan").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(64L, 256L, 1024L))
    val rates = rows.map(_.getDouble(4))
    assert(rates(0) <= rates(1) + 1e-12 && rates(1) <= rates(2) + 1e-12)
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2)) // hits <= lookups
      // a cache of the whole key domain hits everything
      if (r.getLong(0) >= r.getLong(1)) assert(r.getDouble(4) == 1.0)
    }
  }
}
