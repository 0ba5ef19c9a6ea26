package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-9 ANN index-shape batch at
  * sf0.001 (exact values ride the DuckDB oracle gate at sf0.01).
  */
class Round9cQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round9cQueries.queries(name)(spark, sf0001)

  test("ann_spann_closure: primaries partition the corpus; blowup >= 1") {
    val rows = run("ann_spann_closure").collect()
    val nVecs = graft.Tables(spark, sf0001, "embeddings").count()
    // every vector has exactly one primary assignment
    assert(rows.map(_.getLong(1)).sum == nVecs)
    rows.foreach { r =>
      assert(r.getLong(3) == r.getLong(1) + r.getLong(2)) // total = p + c
      assert(r.getDouble(4) >= 1.0 ||
        r.getLong(1) == 0) // blowup >= 1 whenever the cell has primaries
    }
  }

  test("ann_spann_recall: per-probe counters are consistent") {
    val rows = run("ann_spann_recall").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { r =>
      val (cands, hits, recall) =
        (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(hits <= 10 && hits >= 0)
      assert(hits <= cands) // can't hit more than you scanned
      assert(math.abs(recall - hits / 10.0) < 1e-15)
    }
  }

  test("q_ann_probe_sweep: recall and candidates are monotone in nprobe") {
    val rows = run("q_ann_probe_sweep").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 4))
    val recalls = rows.map(_.getDouble(2)).toSeq
    val cands = rows.map(_.getDouble(3)).toSeq
    // probing more cells can only add candidates, so top-10 quality and
    // scanned volume are both non-decreasing
    assert(recalls == recalls.sorted,
      s"recall not monotone: $recalls")
    assert(cands == cands.sorted)
    rows.foreach(r => assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
  }

  test("spann nprobe=1 search beats or ties plain-IVF nprobe=1 recall") {
    // the point of the closure replicas: boundary vectors live in the
    // neighboring posting list too, recovering nprobe=1 misses
    val spann = run("ann_spann_recall").collect()
      .map(r => r.getLong(2)).sum // total hits over probes
    val ivf1 = run("q_ann_probe_sweep").collect()
      .find(_.getInt(0) == 1).get.getLong(1)
    assert(spann >= ivf1,
      s"closure search ($spann hits) must cover plain nprobe=1 ($ivf1)")
  }
}
