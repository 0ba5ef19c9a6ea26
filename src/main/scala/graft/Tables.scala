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
      // events.ts has shipped as two physical types across testdata
      // generations, so dispatch on the read schema:
      //  - TIMESTAMP(NANOS): Spark 4 rejects it (PARQUET_TYPE_ILLEGAL)
      //    unless spark.sql.legacy.parquet.nanosAsLong=true (set by
      //    GraftSession), which reads it as LONG epoch-nanos. Truncate
      //    to micros with integer `div`, not `/` — epoch-nanos (~1.7e18)
      //    overflow a double's 53-bit mantissa. Matches DuckDB's own
      //    ns->us truncation so oracle SQL sees identical instants.
      //  - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark reads
      //    TIMESTAMP_NTZ; cast to session-local TIMESTAMP (session tz is
      //    pinned UTC) so unix_micros()/window() keep working and the
      //    wall-clock instants match DuckDB's naive timestamps.
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000L")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn("ts", col("ts").cast("timestamp"))
        case _ => df
      }
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }
}
