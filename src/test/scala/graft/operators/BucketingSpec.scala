package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Bucketing as the co-located-join strategy (SURVEY §4 / 100 TB
  * design): two fact tables bucketed on the join key join WITHOUT a
  * shuffle exchange on either side — at scale this converts the
  * biggest recurring join in a pipeline from 2 full shuffles to 0.
  * (The equivalent of the reference's write-local hash routing, applied
  * to storage instead of a sink: ClickHouseShardOutputFormat.java:72-81
  * keeps shard-affine data local the same way.)
  */
class BucketingSpec extends AnyFunSuite with SparkSuite {

  test("bucketed-by-key tables join with zero shuffle exchanges") {
    val orders = graft.Tables(spark, sf0001, "orders")
    val lineitem = graft.Tables(spark, sf0001, "lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the sort-merge path: the point is the absence of the
      // EXCHANGE, not the join algorithm choice on a tiny table
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      val joinSection = plan.split("HashAggregate").last // below the agg
      assert(joinSection.contains("SortMergeJoin"))
      // bucket layout satisfies the join's distribution on BOTH sides:
      // no Exchange anywhere under the join
      assert(!joinSection.contains("Exchange hashpartitioning"),
        s"unexpected shuffle in bucketed join plan:\n$plan")
      // and the result is still correct
      val n = joined.agg(sum("n")).collect()(0).getLong(0)
      assert(n == lineitem.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
