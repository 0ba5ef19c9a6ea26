package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-8 Gumbel/entropy/inference batch
  * at sf0.001 (exact values ride the DuckDB oracle gate at sf0.01).
  */
class Round8oQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round8oQueries.queries(name)(spark, sf0001)

  test("q_gumbel_topk: five per language, keys descending, docs distinct") {
    val rows = run("q_gumbel_topk").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      assert(rs.length <= 5, s"$lang has ${rs.length} rows")
      val keys = rs.sortBy(_.getLong(1)).map(_.getDouble(4))
      assert(keys.sliding(2).forall {
        case Array(a, b) => a >= b
        case _ => true
      }, s"$lang keys not descending")
      assert(rs.map(_.getLong(2)).distinct.length == rs.length)
    }
  }

  test("q_mixture_entropy: entropy rises with tau flattening reversed, perplexity = e^H") {
    val rows = run("q_mixture_entropy").collect()
    assert(rows.length == 4)
    val byTau = rows.sortBy(_.getInt(0))
    byTau.foreach { r =>
      val (h, ppl) = (r.getDouble(1), r.getDouble(2))
      assert(h >= 0.0 && h <= math.log(64.0))
      assert(math.abs(ppl - math.exp(h)) / math.exp(h) < 1e-9)
    }
    // lower tau = flatter mixture = HIGHER entropy
    val hs = byTau.map(_.getDouble(1))
    assert(hs.sliding(2).forall { case Array(a, b) => b <= a + 1e-12 },
      s"entropy not nonincreasing in tau: ${hs.mkString(",")}")
  }

  test("q_lr_score: probabilities in (0,1), median between min and max") {
    val rows = run("q_lr_score").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, nPass, mn, med, mx) = (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(n > 0 && nPass >= 0 && nPass <= n)
      assert(mn > 0.0 && mx < 1.0, "sigmoid must stay strictly in (0,1)")
      assert(mn <= med && med <= mx)
    }
  }
}
