package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-8 retrieval/batching/sketch batch
  * at sf0.001 (exact values ride the DuckDB oracle gate at sf0.01).
  */
class Round8gQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round8gQueries.queries(name)(spark, sf0001)

  test("q_ndcg_eval: ndcg in [0,1], idcg >= dcg, rel counts bounded") {
    val rows = run("q_ndcg_eval").collect()
    assert(rows.nonEmpty && rows.length <= 16)
    rows.foreach { r =>
      val (nRel, dcg, idcg, ndcg) = (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))
      assert(nRel >= 0 && nRel <= 10)
      assert(dcg >= 0.0 && idcg >= dcg - 1e-12,
        s"ideal DCG $idcg below DCG $dcg")
      assert(ndcg >= 0.0 && ndcg <= 1.0 + 1e-12)
      if (nRel == 0) assert(ndcg == 0.0)
    }
  }

  test("q_padding_waste: sorted batching never wastes more than arrival") {
    val r = run("q_padding_waste").collect()(0)
    val (nDocs, nToks, sw, aw) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3))
    assert(nDocs > 0 && nToks > 0)
    assert(sw >= 0 && aw >= 0)
    // length-sorted batches are optimal among contiguous groupings
    assert(sw <= aw, s"sorted waste $sw exceeds arrival waste $aw")
    assert(r.getDouble(4) <= 1.0 + 1e-12)
  }

  test("q_bloom_fpp_audit: fill and fpp in [0,1], bits bounded") {
    val r = run("q_bloom_fpp_audit").collect()(0)
    val (nPresent, nAbsent, bitsSet, fill, nFp, fpp) = (r.getLong(0),
      r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4),
      r.getDouble(5))
    assert(nPresent > 0 && nAbsent > 0)
    assert(bitsSet > 0 && bitsSet <= math.min(16384L, 3 * nPresent))
    assert(fill > 0.0 && fill <= 1.0)
    assert(nFp >= 0 && nFp <= nAbsent)
    assert(fpp >= 0.0 && fpp <= 1.0)
    // k=3 hashes: empirical FPP cannot beat fill^3 by much more than
    // noise, and can never exceed 1; sanity-bound it by fill (each
    // probe needs all 3 bits set)
    assert(fpp <= fill + 1e-12)
  }
}
