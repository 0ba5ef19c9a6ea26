package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-7 sequence/tuning batch at
  * sf0.001 (exact values are covered by the DuckDB oracle gate).
  */
class Round7gQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round7gQueries.queries(name)(spark, sf0001)

  test("q_skipgram_sequences: counts sorted desc, types non-empty") {
    val rows = run("q_skipgram_sequences").collect()
    assert(rows.nonEmpty)
    val counts = rows.map(_.getLong(2))
    assert(counts.zip(counts.tail).forall { case (x, y) => x >= y })
    rows.foreach(r =>
      assert(r.getString(0).nonEmpty && r.getString(1).nonEmpty))
  }

  test("dedup_band_tuning_curve: more bands never reduce candidate pairs") {
    val rows = run("dedup_band_tuning_curve").collect()
    assert(rows.map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 4, 8))
    rows.foreach { r =>
      assert(r.getInt(0) * r.getInt(1) == 8, "b*r must factorize the signature")
      assert(r.getLong(4) >= 1)                // max bucket
      // a bucket of size m alone predicts m(m-1)/2 of the pair mass
      assert(r.getLong(3) >= r.getLong(4) * (r.getLong(4) - 1) / 2)
    }
    // recall (and so candidate mass) is monotone in the band count
    val byBands = rows.sortBy(_.getInt(0)).map(_.getLong(3))
    assert(byBands.zip(byBands.tail).forall { case (x, y) => x <= y },
      s"pair mass must grow with bands: ${byBands.mkString(",")}")
  }

  test("q_xyz_variability: classes partition parts") {
    val rows = run("q_xyz_variability").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getString(0)).forall(Set("X", "Y", "Z")))
    val share = rows.map(_.getDouble(3)).sum
    assert(math.abs(share - 1.0) < 1e-9, "shares must sum to one")
  }

  test("q_peak_concurrency: peaks positive, user counts cover all users") {
    val rows = run("q_peak_concurrency").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) >= 1, "every user with events has peak >= 1")
      assert(r.getLong(1) >= 1)
    }
  }
}
