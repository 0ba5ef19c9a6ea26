package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Accuracy bound for q_approx_distinct — the one query with no DuckDB
  * oracle (HLL++ is approximate, and estimates are implementation-
  * specific so no cross-engine compare is possible). The published
  * HLL++ guarantee is a standard error of `rsd`; 3·rsd is the
  * 99.7%-confidence band, and Spark's implementation is deterministic
  * for a fixed input set, so this is a stable (not flaky) assertion.
  */
class ApproxDistinctSpec extends AnyFunSuite with SparkSuite {

  test("q_approx_distinct: every group estimate within 3*rsd of exact") {
    val est = RelationalQueries.queries("q_approx_distinct")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.Tables(spark, sf0001, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    val rsd = 0.05 // approx_count_distinct's default relative std dev
    exact.foreach { case (flag, n) =>
      val e = est(flag)
      assert(math.abs(e - n) <= 3 * rsd * n,
        s"$flag: estimate $e vs exact $n exceeds 3*rsd band (${3 * rsd * n})")
    }
  }
}
