package graft.sink

/** Cluster topology for write-local mode — the Spark-side analog of the
  * reference's discovery path (R16): if `sink.write-local-nodes` is set it
  * is parsed directly; otherwise the reference queries the coordinator's
  * system.clusters for `(shard_num, host_address, port) WHERE cluster = ?
  * AND replica_num = 1`
  * (CH/table/internal/connection/ClickHouseConnectionProvider.java:95-116,
  * option doc at ClickHouseDynamicTableFactory.java:100-106).
  *
  * In Spark the topology is resolved ONCE on the driver before planning —
  * the shard count feeds `repartition(n, keys)` and each output partition
  * gets its shard's JDBC URL — rather than per-writer-instance as in the
  * reference. Discovery-by-query needs a live cluster, so offline the
  * explicit node list is the supported path; the query is recorded here
  * for a live deployment.
  */
final case class ShardNode(shardNum: Int, host: String, port: Int) {
  def jdbcUrl(database: String): String =
    s"jdbc:clickhouse://$host:$port/$database"
}

object ShardTopology {

  /** The discovery SQL the reference issues when no node list is given. */
  val DiscoveryQuery: String =
    "SELECT shard_num, host_address, port FROM system.clusters " +
      "WHERE cluster = ? and replica_num = 1"

  /** Parse an explicit `sink.write-local-nodes` list: comma-separated
    * host:port entries, shard numbers assigned by position (1-based,
    * matching system.clusters.shard_num).
    */
  def parse(nodes: String): Seq[ShardNode] =
    nodes.split(",").map(_.trim).filter(_.nonEmpty).zipWithIndex.map {
      case (entry, i) =>
        entry.split(":") match {
          case Array(host, port) if port.forall(_.isDigit) && host.nonEmpty =>
            ShardNode(i + 1, host, port.toInt)
          case _ => throw new IllegalArgumentException(
            s"Malformed node entry `$entry`; expected host:port")
        }
    }.toSeq

  /** Topology for a write: explicit nodes if configured, else empty (a
    * live deployment would run DiscoveryQuery here).
    */
  def resolve(options: GraftSinkOptions): Seq[ShardNode] =
    options.writeLocalNodes.map(parse).getOrElse(Seq.empty)

  /** The JDBC URL a given shard partition writes to: its local node in
    * write-local mode with a configured topology, the coordinator URL
    * otherwise (one executor+connection per shard,
    * ClickHouseShardOutputFormat.java:60-70).
    */
  def urlForShard(options: GraftSinkOptions, shard: Int): String = {
    val nodes = if (options.writeLocal) resolve(options) else Seq.empty
    if (nodes.isEmpty) options.url
    else nodes(((shard % nodes.size) + nodes.size) % nodes.size)
      .jdbcUrl(options.databaseName)
  }
}
