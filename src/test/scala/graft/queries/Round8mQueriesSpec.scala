package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-8 retrieval/quantization/capacity
  * batch at sf0.001 (exact values ride the DuckDB oracle gate at
  * sf0.01).
  */
class Round8mQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round8mQueries.queries(name)(spark, sf0001)

  test("q_colbert_maxsim: scores bounded by #probes, ranked descending") {
    val rows = run("q_colbert_maxsim").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val scores = rows.map(_.getDouble(1))
    // sum of at most 16 cosines, each <= 1
    assert(scores.forall(v => v >= -16.0 && v <= 16.0))
    assert(scores.sliding(2).forall { case Array(a, b) => a >= b },
      "MaxSim not descending in rank")
    assert(rows.map(_.getLong(2)).toSeq ==
      (1L to rows.length.toLong).toSeq)
  }

  test("q_residual_quantize: census covers corpus, error positive") {
    val rows = run("q_residual_quantize").collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(2)).sum
    val err = rows.head.getDouble(3)
    assert(err >= 0.0)
    assert(rows.forall(_.getDouble(3) == err), "total_err2 not constant")
    // every vector lands in exactly one (c1, c2) cell
    val n = spark.read.parquet(s"$sf0001/embeddings.parquet").count()
    assert(total == n, s"census $total != corpus $n")
    rows.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) < 8)
      assert(r.getLong(1) >= 8 && r.getLong(1) <= 15)
    }
  }

  test("q_partition_advisor: exact byte model, ceil partitions") {
    val rows = run("q_partition_advisor").collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val (n, bytes, parts, rpp) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))
      assert(n > 0 && bytes > 8 * n, "bytes below fixed-width floor")
      assert(parts == math.max(1L, (bytes + 67108863) / 67108864))
      assert(rpp == (n + parts - 1) / parts)
    }
  }
}
