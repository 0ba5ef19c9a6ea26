package graft.sink

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shard routing, Spark-first: where the reference routes each record
  * inside the writer process (the CH/table/internal/partitioner classes and
  * ClickHouseShardOutputFormat.java:72-81), we express the assignment as
  * a column / repartitioning and let Spark's shuffle service do the
  * routing — each output partition then holds exactly one shard's rows
  * and gets one connection, which is the same write-local topology with
  * the data movement handled by the engine (SURVEY.md §3 E3).
  */
object Partitioners {

  /** Round-robin (BalancedPartitioner.java:10-14): `next = (next+1) % n`
    * per writer task. Spark-native: RoundRobinPartitioning via
    * repartition(n) — even spread with no key.
    * (Explicit shard-id columns are intentionally NOT provided here:
    * repartition(n, col) murmur3-hashes the column, which is not a
    * bijection on 0..n-1 — the query-level hash-shard assignment lives in
    * ChangelogOps.withHashShard, which IS the oracle-mirrored form.)
    */
  def balanced(df: DataFrame, numShards: Int): DataFrame =
    df.repartition(numShards)

  /** Apply a strategy: the resulting DataFrame has numShards partitions,
    * each holding one shard's rows (mirrors one executor+connection per
    * shard, ClickHouseShardOutputFormat.java:60-70).
    */
  def applyStrategy(df: DataFrame, options: GraftSinkOptions,
      numShards: Int): DataFrame =
    options.partitionStrategy match {
      case PartitionStrategy.Hash =>
        val keys = options.partitionKeys
        require(keys.nonEmpty,
          "A partition key must be provided for hash partition strategy")
        keys.foreach { k =>
          if (!df.columns.contains(k))
            throw new IllegalArgumentException(
              s"Partition key `$k` not found in table schema")
        }
        df.repartition(numShards, keys.map(df.col): _*)
      case PartitionStrategy.Shuffle =>
        // RoundRobinPartitioning starts each task's counter at a random
        // position — key-independent and uniform across exactly n
        // partitions, which is the shuffle contract; hashing a random
        // column would lose the n-way uniformity (see shuffleShard)
        df.repartition(numShards)
      case _ =>
        balanced(df, numShards)
    }
}
