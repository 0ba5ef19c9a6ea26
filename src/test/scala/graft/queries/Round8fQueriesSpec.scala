package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-8 clustering-evaluation batch at
  * sf0.001 (exact values ride the DuckDB oracle gate at sf0.01).
  */
class Round8fQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round8fQueries.queries(name)(spark, sf0001)

  test("q_adjusted_rand: ARI/NMI in range, table dims sane") {
    val r = run("q_adjusted_rand").collect()(0)
    val (n, nc, nl, ari, nmi) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getDouble(3), r.getDouble(4))
    assert(n > 0 && nc > 0 && nc <= 8 && nl > 0)
    assert(ari >= -1.0 && ari <= 1.0, s"ARI $ari out of [-1,1]")
    assert(nmi >= 0.0 && nmi <= 1.0 + 1e-12, s"NMI $nmi out of [0,1]")
  }

  test("q_hard_negatives: one row per probe, sims in [-1,1], margin consistent") {
    val rows = run("q_hard_negatives").collect()
    assert(rows.nonEmpty && rows.length <= 16)
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    rows.foreach { r =>
      val (posSim, negSim, margin) =
        (r.getDouble(2), r.getDouble(4), r.getDouble(5))
      assert(posSim >= -1.0 - 1e-9 && posSim <= 1.0 + 1e-9)
      assert(negSim >= -1.0 - 1e-9 && negSim <= 1.0 + 1e-9)
      assert(math.abs(margin - (posSim - negSim)) < 1e-12)
      // positive and negative must be corpus vectors, not probes
      assert(r.getLong(1) >= 16 && r.getLong(3) >= 16)
    }
  }

  test("q_graph_modularity: within-weight bounded, Q in [-1,1]") {
    val r = run("q_graph_modularity").collect()(0)
    val (nComm, wTot, wIn, q) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getDouble(3))
    assert(nComm > 0 && wTot > 0)
    assert(wIn >= 0 && wIn <= wTot, "within-community weight exceeds total")
    assert(q >= -1.0 && q <= 1.0, s"modularity $q out of [-1,1]")
  }
}
