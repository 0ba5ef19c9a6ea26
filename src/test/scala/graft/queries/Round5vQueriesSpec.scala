package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-5v native-operator/DQ batch at
  * sf0.001 (exact values are covered by the DuckDB oracle gate;
  * operator-level equivalence lives in AsOfJoinOpSpec).
  */
class Round5vQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round5vQueries.queries(name)(spark, sf0001)

  test("q_asof_native: one row per click, matches never in the future") {
    val rows = run("q_asof_native").collect()
    val nClicks = graft.Tables(spark, sf0001, "events")
      .filter("event_type = 'click'").count()
    assert(rows.length == nClicks)
    rows.foreach { r =>
      if (!r.isNullAt(5)) assert(r.getLong(5) <= r.getLong(2))
    }
  }

  test("q_asof_native_forward: matches never in the past") {
    val rows = run("q_asof_native_forward").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(5)) assert(r.getLong(5) >= r.getLong(2))
    }
  }

  test("q_dq_constraints: four constraints, sane metrics") {
    val rows = run("q_dq_constraints").collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("completeness_text", "domain_lang", "range_n_chars",
        "uniqueness_doc_id"))
    rows.foreach { r =>
      val (name, metric, passed) =
        (r.getString(0), r.getDouble(1), r.getBoolean(2))
      if (name != "range_n_chars") {
        assert(metric >= 0.0 && metric <= 1.0)
        assert(passed == (metric == 1.0))
      }
    }
  }
}
