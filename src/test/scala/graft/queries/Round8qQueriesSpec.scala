package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-8 wavelet/MMD/SPRT batch at
  * sf0.001 (exact values ride the DuckDB oracle gate at sf0.01).
  */
class Round8qQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round8qQueries.queries(name)(spark, sf0001)

  test("q_haar_energy: halving coefficient counts, nonnegative energy") {
    val rows = run("q_haar_energy").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    assert(rows.map(_.getLong(1)).toSeq == Seq(32L, 16L, 8L))
    rows.foreach(r => assert(r.getDouble(2) >= 0.0))
  }

  test("q_mmd_poly: kernel means positive, mmd2 consistent") {
    val r = run("q_mmd_poly").collect()(0)
    val (na, nb, mAA, mBB, mAB, mmd2) = (r.getLong(0), r.getLong(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    assert(na > 0 && na <= 100 && nb > 0 && nb <= 100)
    // polynomial kernel (1 + x.y/64)^2 is nonnegative by construction
    assert(mAA >= 0.0 && mBB >= 0.0 && mAB >= 0.0)
    assert(math.abs(mmd2 - (mAA + mBB - 2 * mAB)) < 1e-12)
    // biased-estimator MMD^2 (diagonal included) is nonnegative
    assert(mmd2 >= -1e-9, s"mmd2 $mmd2 negative beyond tolerance")
  }

  test("q_sprt_monitor: decision consistent with the crossed boundary") {
    val rows = run("q_sprt_monitor").collect()
    assert(rows.length == 1)
    val r = rows(0)
    val (nObs, nSucc, dec, llr) = (r.getLong(0), r.getLong(1),
      r.getString(2), r.getDouble(3))
    assert(nObs > 0 && nSucc >= 0 && nSucc <= nObs)
    if (dec == "accept_h1") assert(llr >= math.log(19.0) - 1e-9)
    else {
      assert(dec == "accept_h0")
      assert(llr <= -math.log(19.0) + 1e-9)
    }
    // the crossing is the FIRST one: one step earlier must be inside
    // the continuation region (|llr| decreases by one increment)
    assert(math.abs(llr) - 0.4054651081081644 < math.log(19.0))
  }
}
