package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-8 retrieval-eval batch at
  * sf0.001 (exact values ride the DuckDB oracle gate at sf0.01).
  */
class Round8sQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round8sQueries.queries(name)(spark, sf0001)

  private def checkRecallRow(name: String): (Long, Long, Double) = {
    val r = run(name).collect()(0)
    val (np, hits, rec) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(np == 20, s"$name probes")
    assert(hits >= 0 && hits <= 10 * np)
    assert(math.abs(rec - hits.toDouble / (10.0 * np)) < 1e-12)
    (np, hits, rec)
  }

  test("q_matryoshka_recall: bounded recall, prefix keeps real signal") {
    val (_, hits, rec) = checkRecallRow("q_matryoshka_recall")
    // a 16-of-64 prefix shares 1/4 of the inner-product mass — it must
    // beat the ~0.5% random-overlap floor by a wide margin
    assert(rec > 0.05, s"prefix recall $rec (hits $hits) is random-level")
  }

  test("q_binary_hamming_recall: bounded recall, signs keep signal") {
    val (_, hits, rec) = checkRecallRow("q_binary_hamming_recall")
    assert(rec > 0.05, s"hamming recall $rec (hits $hits) is random-level")
  }

  test("q_map_eval: MAP@10 in [0,1] over all probes") {
    val r = run("q_map_eval").collect()(0)
    val (np, map) = (r.getLong(0), r.getDouble(1))
    assert(np == 20)
    assert(map >= 0.0 && map <= 1.0 + 1e-12, s"map $map")
  }
}
