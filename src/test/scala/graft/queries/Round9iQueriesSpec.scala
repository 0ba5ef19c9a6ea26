package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-9 encoding-planner batch at
  * sf0.001 (exact values ride the DuckDB oracle gate at sf0.01).
  */
class Round9iQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round9iQueries.queries(name)(spark, sf0001)

  private lazy val nLineitem =
    graft.Tables(spark, sf0001, "lineitem").count()

  test("q_bitpack_plan: rows partition, packed beats plain, bits <= 64") {
    val rows = run("q_bitpack_plan").collect()
    assert(rows.map(_.getLong(2)).sum == nLineitem)
    val bits = rows.map(_.getInt(0))
    assert(bits.toSeq == bits.sorted.toSeq && bits.forall(b => b >= 0 && b <= 64))
    val packed = rows.map(_.getLong(3)).sum
    val plain = rows.map(_.getLong(4)).sum
    assert(plain == nLineitem * 8)
    // sorted keys over 1024-row blocks span far less than 64 bits
    assert(packed < plain, s"packed $packed must beat plain $plain")
  }

  test("q_delta_bits_audit: delta packs no worse than FOR on sorted keys") {
    val forRows = run("q_bitpack_plan").collect()
    val dRows = run("q_delta_bits_audit").collect()
    assert(dRows.map(_.getLong(2)).sum == nLineitem)
    val forPacked = forRows.map(_.getLong(3)).sum
    val deltaPacked = dRows.map(_.getLong(3)).sum
    // max in-block delta <= block range, so delta bits <= FOR bits
    // block-by-block — totals follow
    assert(deltaPacked <= forPacked,
      s"delta $deltaPacked vs FOR $forPacked")
  }

  test("q_dict_fallback_sim: fallback point consistent with ndv") {
    val r = run("q_dict_fallback_sim").collect()(0)
    val (n, ndv, budget) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(n == nLineitem && budget == 4096L)
    val share = r.getDouble(4)
    if (ndv <= budget) {
      assert(r.isNullAt(3), "no fallback when the dictionary fits")
      assert(share == 1.0)
    } else {
      val fb = r.getLong(3)
      // the 4097th distinct value can appear at row 4097 at the earliest
      assert(fb >= budget + 1 && fb <= n)
      assert(math.abs(share - (fb - 1).toDouble / n) < 1e-15)
    }
  }
}
