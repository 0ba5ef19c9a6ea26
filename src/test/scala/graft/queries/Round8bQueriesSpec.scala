package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-8 tokenizer-evaluation batch at
  * sf0.001 (exact values ride the DuckDB oracle gate at sf0.01).
  */
class Round8bQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round8bQueries.queries(name)(spark, sf0001)

  test("bpe_fertility_by_lang: fertility in [1, chars/word], identities hold") {
    val rows = run("bpe_fertility_by_lang").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (words, chars, toks) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(words >= 1)
      // a token is at least one char, a word at least one token
      assert(toks >= words, "fewer tokens than words")
      assert(toks <= chars, "more tokens than characters")
      assert(math.abs(r.getDouble(4) - toks.toDouble / words) < 1e-12)
      assert(math.abs(r.getDouble(5) - chars.toDouble / toks) < 1e-12)
      // 5 merges can at most halve the char-token count: fertility is
      // bounded below by 1 and chars_per_token by 1..2+
      assert(r.getDouble(5) >= 1.0 && r.getDouble(5) <= 2.5)
    }
  }

  test("bpe_vocab_table: multi-char tokens exist after training, ordered") {
    val rows = run("bpe_vocab_table").collect()
    assert(rows.length == 20)
    val occs = rows.map(_.getLong(1))
    assert(occs.sliding(2).forall { case Array(a, b) => a >= b },
      "vocab table not ordered by occurrence")
    rows.foreach { r =>
      assert(r.getInt(2) == r.getString(0).length)
      assert(!r.getString(0).contains("|"))
    }
    // the 5 trained merges must surface as multi-char vocabulary
    assert(rows.exists(_.getInt(2) >= 2),
      "no merged token reached the top-20 — training had no effect")
  }

  test("bpe_merge_stability: k rows, counts positive, halves disjoint") {
    val rows = run("bpe_merge_stability").collect()
    assert(rows.length == 5)
    assert(rows.map(_.getInt(0)).toSeq == (1 to 5))
    rows.foreach { r =>
      assert(r.getLong(2) >= 1 && r.getLong(4) >= 1)
      assert((r.getInt(5) == 1) == (r.getString(1) == r.getString(3)))
    }
    // both halves train on the same synthetic distribution: the FIRST
    // merge (strongest statistic) must agree even at sf0.001
    assert(rows.head.getInt(5) == 1,
      s"split halves disagree on merge 1: ${rows.head}")
  }
}
