package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** AQE skew-join handling (SURVEY §4 / 100 TB design): a join whose
  * shuffle lands 99% of rows in one partition is re-planned at RUNTIME —
  * the oversized partition is split across tasks (OptimizeSkewedJoin)
  * instead of serializing the stage on one straggler. This is the
  * engine-managed complement to the explicit salting queries
  * (q_salted_join / q_salted_agg), which remain the portable fallback.
  */
class SkewJoinSpec extends AnyFunSuite with SparkSuite {

  test("AQE splits the skewed partition of a sort-merge join") {
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      // statistics-relative knobs scaled down to the test fixture: the
      // hot partition is ~100s of KB compressed, not the default 256MB
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2KB",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true")
    val prev = confs.keys.map(k =>
      k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = graft.Tables(spark, "/root/testdata/sf0.01", "lineitem")
        // the test parquet is single-row-group = ONE map task, and AQE
        // can only split a skewed reduce partition along MAPPER
        // boundaries — spread the scan so splits are possible (real
        // 100 TB scans always have many mappers)
        .repartition(8)
        // 99% of rows collapse onto key 0: the classic hot key
        .withColumn("k",
          when(col("l_orderkey") % 100 < 99, 0L).otherwise(col("l_orderkey")))
      // covering dim WITHOUT an aggregate: OptimizeSkewedJoin only
      // matches SMJ(Sort(Shuffle), Sort(Shuffle)) — a distinct's final
      // HashAggregate above the shuffle stage defeats the pattern
      val maxKey = li.agg(max(col("k"))).collect()(0).getLong(0)
      val dim = spark.range(0, maxKey + 1)
        .select(col("id").as("k"), (col("id") * 2).as("tag"))
      val joined = li.join(dim, "k")
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      // AQE decides skew splits from RUNTIME shuffle statistics — force
      // execution, then inspect the final adaptive plan
      val rows = joined.collect()
      assert(rows.map(_.getLong(1)).sum == li.count())
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"no skew-split join in the final adaptive plan:\n$finalPlan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
