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

  /** Shard id column for the hash strategy: nonneg(mix(keys)) % n.
    * The reference uses Java Objects.hashCode(values) then
    * `(h % n + n) % n` (HashPartitioner.java:18-25); the contract is
    * "same key tuple -> same shard", which any deterministic mix
    * preserves. We use a 31-weighted sum (the same mix as
    * java.util.Arrays.hashCode) so routing is reproducible in plain SQL.
    */
  def hashShard(keys: Seq[Column], numShards: Int): Column =
    pmod(keys.reduceLeft((a, b) => a * 31 + b), lit(numShards))

  /** Round-robin (BalancedPartitioner.java:10-14): `next = (next+1) % n`
    * per writer task. Spark-native: RoundRobinPartitioning via
    * repartition(n) — even spread with no key.
    */
  def balanced(df: DataFrame, numShards: Int): DataFrame =
    df.repartition(numShards)

  /** Uniform random shard id column (ShufflePartitioner.java:10-13).
    * NOTE: only an assignment column — do NOT feed it to
    * repartition(n, col): Spark re-hashes the column (murmur3 % n), which
    * is not a bijection on 0..n-1, so some shards would systematically
    * starve while others double up.
    */
  def shuffleShard(numShards: Int): Column =
    (rand() * numShards).cast("int")

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
