package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-8 feature/whitening/balancing
  * batch at sf0.001 (exact values ride the DuckDB oracle gate at
  * sf0.01).
  */
class Round8pQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round8pQueries.queries(name)(spark, sf0001)

  test("q_feature_mi: MI in [0, ln2], length-derived features informative") {
    val rows = run("q_feature_mi").collect()
    assert(rows.length == 3)
    val mis = rows.map(r => r.getString(0) -> r.getDouble(2)).toMap
    mis.values.foreach { mi =>
      // MI with a binary label is bounded by H(label) <= ln 2
      assert(mi > -1e-9 && mi <= math.log(2.0) + 1e-9,
        s"MI $mi outside [0, ln2]")
    }
    // the label is a token-length threshold: the length-derived
    // features must carry nonzero information (the //40 binning can
    // straddle the threshold, so dominance ORDER is not guaranteed)
    assert(mis("f_toklen") > 1e-6 && mis("f_charlen") > 1e-6)
    rows.foreach(r => assert(r.getLong(1) > 0))
  }

  test("q_whitening_stats: 64 dims, positive variance, scale consistent") {
    val rows = run("q_whitening_stats").collect()
    assert(rows.length == 64)
    assert(rows.map(_.getLong(0)).toSeq == (1L to 64L).toSeq)
    rows.foreach { r =>
      val (n, v, scale) = (r.getLong(1), r.getDouble(3), r.getDouble(4))
      assert(n > 0)
      assert(v >= 0.0, s"variance $v negative")
      assert(math.abs(scale - 1.0 / math.sqrt(v + 1e-6)) < 1e-9)
    }
  }

  test("q_class_weights: inverse-frequency averages to 1, eff-num positive") {
    val rows = run("q_class_weights").collect()
    assert(rows.nonEmpty)
    val k = rows.head.getLong(3)
    assert(k == rows.length)
    // sum over classes of n_c * inv_freq_w = n => weighted mean is 1
    val n = rows.head.getLong(2)
    val weighted = rows.map(r => r.getLong(1) * r.getDouble(4)).sum
    assert(math.abs(weighted - n) < 1e-6 * n)
    rows.foreach { r =>
      val (nc, invW, effW) = (r.getLong(1), r.getDouble(4),
        r.getDouble(5))
      assert(nc > 0 && invW > 0.0 && effW > 0.0)
      // effective-number weight: (1-b)/(1-b^n), b=0.999 — for small
      // n_c this approaches 1/n_c, for huge n_c it approaches 1-b
      assert(effW >= (1.0 - 0.999) - 1e-12 && effW <= 1.0 + 1e-12)
    }
  }
}
