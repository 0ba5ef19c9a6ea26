package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-8 embedding batch at sf0.001
  * (exact values ride the DuckDB oracle gate at sf0.01).
  */
class Round8cQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round8cQueries.queries(name)(spark, sf0001)

  test("ann_ivfpq_topk: ranked ADC distances, probe excluded, subset of PQ scan") {
    val rows = run("ann_ivfpq_topk").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val dists = rows.map(_.getDouble(1))
    assert(dists.forall(_ >= 0.0))
    assert(dists.sliding(2).forall { case Array(a, b) => a <= b },
      "ADC distances not ascending")
    assert(!rows.exists(_.getLong(0) == 0), "probe must be excluded")
    // every IVF-PQ result is also ADC-rankable by the full-corpus PQ
    // scan with the SAME distance (same codes, same ADC table): the
    // cell restriction changes WHICH vectors compete, not their adist
    val full = Pipeline2Queries.queries("ann_pq_topk")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      full.get(r.getLong(0)).foreach { d =>
        assert(math.abs(d - r.getDouble(1)) < 1e-12,
          s"adist diverges from the full PQ scan for vec ${r.getLong(0)}")
      }
    }
  }

  test("decontam_embedding: counts bounded, rates consistent, bench excluded") {
    val rows = run("decontam_embedding").collect()
    assert(rows.nonEmpty)
    var total = 0L
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(math.abs(r.getDouble(3) -
        r.getLong(2).toDouble / r.getLong(1)) < 1e-12)
      total += r.getLong(1)
    }
    // corpus = all vectors except the 16 bench probes
    val n = graft.Tables(spark, sf0001, "embeddings").count()
    assert(total == n - 16, s"census covers $total of ${n - 16} corpus vecs")
  }

  test("q_emb_centroid_purity: partition of all vectors, purity in (0,1]") {
    val rows = run("q_emb_centroid_purity").collect()
    assert(rows.length == 8, "8 seed centroids")
    var total = 0L
    rows.foreach { r =>
      assert(r.getLong(3) >= 1 && r.getLong(3) <= r.getLong(1))
      assert(math.abs(r.getDouble(4) -
        r.getLong(3).toDouble / r.getLong(1)) < 1e-12)
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
      total += r.getLong(1)
    }
    val n = graft.Tables(spark, sf0001, "embeddings").count()
    assert(total == n, "assignment must partition the vector set")
  }
}
