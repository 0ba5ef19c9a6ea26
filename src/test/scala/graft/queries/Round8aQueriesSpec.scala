package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-8 depth batch at sf0.001 (exact
  * values are covered by the DuckDB oracle gate at sf0.01). sf0.001 has
  * no exact duplicates and may have no near-dup edges at all, so the CC
  * assertions are structural, not positive-count.
  */
class Round8aQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round8aQueries.queries(name)(spark, sf0001)

  test("bpe_train_loop: k merges, counts non-increasing, merges well-formed") {
    val rows = run("bpe_train_loop").collect()
    assert(rows.length == 5, "k=5 training iterations")
    assert(rows.map(_.getInt(0)).toSeq == (1 to 5),
      "one merge per iteration, ordered")
    rows.foreach { r =>
      val l = r.getString(1); val rr = r.getString(2)
      assert(r.getString(3) == l + rr, "merged token is left||right")
      assert(l.nonEmpty && rr.nonEmpty)
      assert(!l.contains("|") && !rr.contains("|"),
        "separator must never leak into a token")
      assert(r.getLong(4) >= 1)
    }
    // a pair can never be MORE frequent than the argmax of an earlier
    // iteration: the corpus only loses adjacent pairs as merges apply.
    // (Not strictly monotone — a new pair created by a merge can tie —
    // but iteration 1's winner bounds all later winners.)
    val counts = rows.map(_.getLong(4))
    assert(counts.tail.forall(_ <= counts.head),
      s"later winners exceed iteration 1's argmax: ${counts.toSeq}")
    // distinct merges: applying (l,r) removes every adjacency of that
    // exact pair, so the same pair cannot win twice
    val pairs = rows.map(r => (r.getString(1), r.getString(2)))
    assert(pairs.distinct.length == pairs.length, "repeated merge pair")
  }

  test("bpe_compression_curve: strictly fewer tokens per applied merge") {
    val rows = run("bpe_compression_curve").collect()
    assert(rows.map(_.getInt(0)).toSeq == (0 to 5))
    val toks = rows.map(_.getLong(1))
    assert(toks.head >= 1)
    // each iteration's winning pair has count >= 1, and every applied
    // merge removes exactly (pair occurrences) tokens from the corpus
    toks.sliding(2).foreach { case Array(a, b) =>
      assert(b < a, s"merge applied but token count did not drop: $a -> $b")
    }
  }

  test("bpe_train_loop agrees with bpe_compression_curve token deltas") {
    // iteration i's pair_count (weighted occurrences of the winning
    // pair) == tokens removed from the corpus by applying that merge:
    // the two queries are one loop projected two ways
    val merges = run("bpe_train_loop").collect()
    val curve = run("bpe_compression_curve").collect().map(_.getLong(1))
    merges.foreach { m =>
      val i = m.getInt(0)
      assert(curve(i - 1) - curve(i) == m.getLong(4),
        s"iteration $i: token delta ${curve(i - 1) - curve(i)} != " +
          s"pair_count ${m.getLong(4)}")
    }
  }

  test("dedup_cc_star: labels are component minima, schema matches cc_labels") {
    val star = run("dedup_cc_star").collect()
    assert(star.length > 0)
    star.foreach { r =>
      assert(r.getLong(1) <= r.getLong(0), "cluster_id is a component MIN")
      assert((r.getInt(2) == 1) == (r.getLong(0) != r.getLong(1)))
    }
  }

  test("dedup_cc_star reaches the same fixed point as dedup_cc_labels") {
    // both algorithms label every node with its component minimum over
    // the same edge set — byte-identical output regardless of round
    // structure (star contraction vs min-label propagation)
    val star = run("dedup_cc_star").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val lbl = Pipeline2Queries.queries("dedup_cc_labels")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(star.toSeq == lbl.toSeq)
  }
}
