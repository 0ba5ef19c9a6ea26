package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-7 sampling/routing/audit batch at
  * sf0.001 (exact values are covered by the DuckDB oracle gate).
  */
class Round7cQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round7cQueries.queries(name)(spark, sf0001)

  test("sample_importance: band 4 keeps everything, rates halve downward") {
    val rows = run("sample_importance").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))      // kept <= docs
      assert(r.getLong(4) <= r.getLong(3))      // kept tokens <= total
    }
    rows.find(_.getInt(0) == 4).foreach { r =>
      assert(r.getLong(2) == r.getLong(1), "band 4 must keep all docs")
    }
    // lower bands target rate 2^(band-4); md5 coin keeps them near it
    rows.filter(_.getInt(0) < 4).foreach { r =>
      val target = math.pow(2.0, r.getInt(0) - 4)
      assert(math.abs(r.getDouble(5) - target) < 0.25,
        s"band ${r.getInt(0)}: rate ${r.getDouble(5)} vs target $target")
    }
  }

  test("q_emb_pair_distance_hist: bands within range, counts positive") {
    val rows = run("q_emb_pair_distance_hist").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(0) >= 0 && r.getInt(0) <= 15)
      assert(r.getLong(1) > 0)
    }
  }

  test("multimodal_stft_plan: frame arithmetic consistent per source") {
    val rows = run("multimodal_stft_plan").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (clips, samples, frames, fmax) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(clips > 0 && samples > 0)
      // frames bounded by samples/hop + one per clip
      assert(frames <= samples / 160 + clips)
      assert(fmax <= frames)
    }
  }

  test("q_shingle_idf_jaccard: weighted Jaccard in (0,1], union >= inter") {
    val rows = run("q_shingle_idf_jaccard").collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))       // a_id < b_id
      assert(r.getLong(2) <= r.getLong(3))      // inter <= union
      assert(r.getDouble(4) >= 0.3 && r.getDouble(4) <= 1.0)
    }
  }

  test("dedup_keep_policy_compare: disagreements bounded by clusters") {
    val r = run("dedup_keep_policy_compare").collect().head
    val (clusters, disagree, affected) =
      (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(disagree <= clusters)
    // every disagreeing cluster has >= 2 members
    assert(affected >= 2 * disagree)
    if (clusters > 0)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
  }

  test("multimodal_codec_route: batches cover counts at 32 per batch") {
    val rows = run("multimodal_codec_route").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, batches) = (r.getLong(2), r.getLong(4))
      assert(batches == (n + 31) / 32,
        s"${r.getString(0)}/${r.getString(1)}: $batches batches for $n")
    }
  }
}
