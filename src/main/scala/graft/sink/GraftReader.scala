package graft.sink

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Read-path counterpart of the sink (R15): the reference ships a
  * JDBC→row deserializer that is dead code — it has no scan source
  * (CH/table/internal/converter/ClickHouseRowConverter.java:98-147, never
  * called). In Spark the read path is spark.read.jdbc, which already
  * performs that conversion; what this helper adds is the planning that
  * matters at scale: predicate-partitioned parallel scans derived from
  * the same options object the sink uses, so one config drives both
  * directions.
  */
object GraftReader {

  /** Connection properties from the shared options (user/password wired
    * exactly like the sink's connection provider).
    */
  def connectionProperties(options: GraftSinkOptions): Properties = {
    val p = new Properties()
    options.username.foreach(p.setProperty("user", _))
    options.password.foreach(p.setProperty("password", _))
    p
  }

  /** Range predicates that split a numeric column into `numPartitions`
    * contiguous scans covering (-inf, +inf) — the classic partitioned
    * JDBC read, one executor task per predicate.
    */
  def rangePredicates(column: String, lower: Long, upper: Long,
      numPartitions: Int): Array[String] = {
    require(numPartitions > 0 && upper >= lower,
      s"invalid partitioning: [$lower, $upper] / $numPartitions")
    if (numPartitions == 1) return Array("1=1")
    val stride = math.max(1L, (upper - lower) / numPartitions)
    (0 until numPartitions).map { i =>
      val lo = lower + i * stride
      val hi = lower + (i + 1) * stride
      if (i == 0) s"`$column` < $hi"
      else if (i == numPartitions - 1) s"`$column` >= $lo"
      else s"`$column` >= $lo AND `$column` < $hi"
    }.toArray
  }

  /** Partitioned read of the sink's target table. */
  def read(spark: SparkSession, options: GraftSinkOptions,
      partitionColumn: String, lower: Long, upper: Long,
      numPartitions: Int): DataFrame =
    spark.read.jdbc(
      options.url,
      StatementFactory.quoteIdentifier(options.tableName),
      rangePredicates(partitionColumn, lower, upper, numPartitions),
      connectionProperties(options))
}
