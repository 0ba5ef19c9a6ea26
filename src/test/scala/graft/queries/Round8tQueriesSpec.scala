package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-8 data-quality batch at sf0.001
  * (exact values ride the DuckDB oracle gate at sf0.01).
  */
class Round8tQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round8tQueries.queries(name)(spark, sf0001)

  test("q_fd_violations: g3 bounded by rows minus groups") {
    val rows = run("q_fd_violations").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val (nl, nv, g3, n) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nv <= nl)
      // removing everything but one row per LHS group always repairs
      assert(g3 <= n - nl)
      // a violating FD needs at least one removed row per bad group
      assert(g3 >= nv)
    }
  }

  test("q_column_drift: tvd in [0,1], consistent totals") {
    val rows = run("q_column_drift").collect()
    assert(rows.length == 3)
    val (ne, nl) = (rows(0).getLong(1), rows(0).getLong(2))
    rows.foreach { r =>
      assert(r.getLong(1) == ne && r.getLong(2) == nl,
        "era split identical across columns")
      val tvd = r.getDouble(4)
      assert(tvd >= 0.0 && tvd <= 1.0 + 1e-12, s"tvd $tvd")
      assert(r.getLong(3) >= 1)
    }
  }

  test("q_key_uniqueness: declared PKs hold, counts consistent") {
    val rows = run("q_key_uniqueness").collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      val (n, d, dup, mx) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(d <= n && dup <= d && mx >= 1)
      if (dup == 0) assert(d == n && mx == 1)
    }
    val byName = rows.map(r => r.getString(0) -> r.getLong(3)).toMap
    // the generated surrogate keys are genuinely unique...
    assert(byName("orders.o_orderkey") == 0)
    assert(byName("documents.doc_id") == 0)
    assert(byName("events.event_id") == 0)
    // ...while the synthetic lineitem REUSES line numbers within an
    // order (TESTDATA quirk, also noted in the verify skill) — the
    // audit exists to catch exactly this class of assumed-PK breakage
    assert(byName("lineitem.(l_orderkey,l_linenumber)") > 0)
  }
}
