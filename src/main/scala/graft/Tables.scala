package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All query entry points receive `(spark, sfDir)` and must read inputs
  * exclusively through here so the scan options stay in one place.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects
      // outright (PARQUET_TYPE_ILLEGAL). Read nanos as LONG and truncate
      // to microseconds — integer `div`, not `/`, because epoch-nanos
      // (~1.7e18) overflow a double's 53-bit mantissa. Matches DuckDB's
      // own ns->us truncation so oracle SQL sees identical instants.
      // Requires spark.sql.legacy.parquet.nanosAsLong=true, set by every
      // entry-point session builder (Bench/Verify/Explain/SparkSuite/...)
      // — a loader must not mutate shared session conf as a side effect.
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000L")))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }
}
