package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Accuracy bound for q_approx_distinct. Since r10 the query itself is
  * hash-verifiable (it emits the exact distinct count plus a boolean
  * asserting the HLL estimate sits within 3·rsd), so this spec pins the
  * pieces the oracle row can't see: the boolean is TRUE because the
  * underlying estimate really is in band (recomputed here), not
  * vacuously, and the exact column matches an independent countDistinct.
  * Spark's HLL++ is deterministic for a fixed input set, so this is a
  * stable (not flaky) assertion.
  */
class ApproxDistinctSpec extends AnyFunSuite with SparkSuite {

  test("q_approx_distinct: bound booleans true and honest") {
    val out = RelationalQueries.queries("q_approx_distinct")(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    val exact = graft.Tables(spark, sf0001, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n"),
        approx_count_distinct(col("l_partkey"), 0.05).as("est"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out.keySet == exact.keySet)
    val rsd = 0.05 // the rsd the query passes to approx_count_distinct
    exact.foreach { case (flag, (n, est)) =>
      val (exactOut, ok) = out(flag)
      assert(exactOut == n, s"$flag: exact_parts $exactOut vs $n")
      assert(ok, s"$flag: query reports estimate out of bound")
      assert(math.abs(est - n) <= 3 * rsd * n,
        s"$flag: estimate $est vs exact $n exceeds 3*rsd band (${3 * rsd * n})")
    }
  }
}
