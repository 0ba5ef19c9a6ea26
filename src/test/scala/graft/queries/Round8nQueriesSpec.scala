package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-8 temperature/threshold/softmax
  * batch at sf0.001 (exact values ride the DuckDB oracle gate at
  * sf0.01).
  */
class Round8nQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round8nQueries.queries(name)(spark, sf0001)

  test("DetMath.dexp matches Math.exp to 1e-11 relative") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val xs = Seq(0.0, 0.3, 1.0, 2.5, 7.3, 9.9, 25.0)
    val got = xs.toDF("x")
      .select(graft.functions.DetMath.dexp(col("x"))).as[Double]
      .collect()
    xs.zip(got).foreach { case (x, d) =>
      assert(math.abs(d - math.exp(x)) / math.exp(x) < 1e-11,
        s"dexp($x) = $d vs ${math.exp(x)}")
    }
  }

  test("q_temperature_sweep: shares sum to 1 per tau, tau=100 mirrors corpus") {
    val rows = run("q_temperature_sweep").collect()
    assert(rows.nonEmpty)
    val byTau = rows.groupBy(_.getInt(0))
    byTau.foreach { case (tau, rs) =>
      val shares = rs.map(_.getDouble(3))
      assert(math.abs(shares.sum - 1.0) < 1e-9,
        s"tau=$tau shares sum ${shares.sum}")
      val effN = rs.head.getDouble(4)
      assert(effN >= 1.0 - 1e-9 && effN <= rs.length + 1e-9)
    }
    // tau=100: share must equal the raw corpus proportion
    val t100 = byTau(100)
    val totalN = t100.map(_.getLong(2)).sum.toDouble
    t100.foreach { r =>
      assert(math.abs(r.getDouble(3) - r.getLong(2) / totalN) < 1e-9)
    }
    // lower tau flattens: effective_n is nonincreasing in tau
    val eff = byTau.toSeq.sortBy(_._1).map(_._2.head.getDouble(4))
    assert(eff.sliding(2).forall { case Seq(a, b) => b <= a + 1e-9 })
  }

  test("q_threshold_sweep: monotone counts, F1 consistent") {
    val rows = run("q_threshold_sweep").collect()
    assert(rows.length == 4)
    val tps = rows.map(_.getLong(1))
    // raising the threshold can only lose true positives
    assert(tps.sliding(2).forall { case Array(a, b) => b <= a })
    rows.foreach { r =>
      val (tp, fp, fn, p, rec, f1) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(p >= 0 && p <= 1 && rec >= 0 && rec <= 1)
      if (2 * tp + fp + fn > 0)
        assert(math.abs(f1 - 2.0 * tp / (2 * tp + fp + fn)) < 1e-12)
    }
  }

  test("q_softmax_weights: weights in (0,1], top3 >= max, bounded") {
    val rows = run("q_softmax_weights").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, maxW, top3) = (r.getLong(1), r.getDouble(3),
        r.getDouble(4))
      assert(n > 0)
      assert(maxW > 0.0 && maxW <= 1.0)
      assert(top3 >= maxW - 1e-12 && top3 <= 1.0 + 1e-12)
      // softmax max weight is at least the uniform share
      assert(maxW >= 1.0 / n - 1e-12)
    }
  }
}
