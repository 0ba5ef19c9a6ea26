package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

/** The one private[sql] doorway the custom-operator API needs:
  * materializing a DataFrame from a hand-built LogicalPlan
  * (Dataset.ofRows is private[sql], as in every Spark extension
  * library that adds logical nodes).
  */
object GraftSqlBridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)
}
