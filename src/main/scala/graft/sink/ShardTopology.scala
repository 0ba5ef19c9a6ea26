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

  /** The reference's HTTP-port error pattern: a ClickHouse TCP port
    * answers HTTP probes with this message naming the real HTTP port
    * (ClickHouseConnectionProvider.java:31).
    */
  private val HttpPortPattern =
    "You must use port ([0-9]+) for HTTP\\.".r.unanchored

  /** One discovery row from system.clusters. */
  final case class ClusterRow(shardNum: Int, hostAddress: String, port: Int)

  /** Minimal HTTP probe result — status line code + body text. */
  final case class ProbeResult(status: Int, body: String)

  /** Runs DiscoveryQuery with `cluster` bound to its positional
    * parameter and maps `(shard_num, host_address, port)` rows to
    * ShardNodes, probing each node's advertised port
    * (ClickHouseConnectionProvider.java:95-116). Seams:
    *
    *   - `runQuery(sql, clusterName)` executes the parameterized SQL —
    *     live: a JDBC prepared statement on the coordinator; tests: a
    *     canned row list.
    *   - `probe(host, port)` issues the HTTP GET of
    *     getActualHttpPort (ClickHouseConnectionProvider.java:118-135):
    *     a 200 keeps the advertised port, otherwise the body is matched
    *     for "You must use port N for HTTP." and N wins; anything else
    *     is an error, as is an empty discovery result.
    */
  def discover(clusterName: String,
               runQuery: (String, String) => Seq[ClusterRow],
               probe: (String, Int) => ProbeResult): Seq[ShardNode] = {
    val rows = runQuery(DiscoveryQuery, clusterName)
    if (rows.isEmpty)
      throw new IllegalStateException(
        "unable to query shards in system.clusters")
    rows.map { r =>
      ShardNode(r.shardNum, r.hostAddress,
        actualHttpPort(r.hostAddress, r.port, probe))
    }
  }

  /** The reference's port fix-up: advertised port if it already speaks
    * HTTP, else the port named in the error body.
    */
  def actualHttpPort(host: String, port: Int,
                     probe: (String, Int) => ProbeResult): Int = {
    val res = probe(host, port)
    if (res.status == 200) port
    else res.body match {
      case HttpPortPattern(p) => p.toInt
      case _ => throw new IllegalStateException(
        s"Cannot query ClickHouse http port $host:$port")
    }
  }

  /** Live probe over java.net.HttpURLConnection (no extra deps): GET
    * http://host:port/ and surface (status, body) for actualHttpPort.
    * Transport failures (connect refused/timeout) are rethrown as
    * IllegalStateException so every discovery failure mode surfaces
    * uniformly, matching the reference's wrapped 'Cannot connect to
    * ClickHouse server using HTTP' error
    * (ClickHouseConnectionProvider.java:118-135) — callers catch ONE
    * exception type for the whole discovery path.
    */
  def httpProbe(host: String, port: Int): ProbeResult = {
    val url = java.net.URI.create(s"http://$host:$port/").toURL
    try {
      val conn = url.openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setConnectTimeout(5000)
      conn.setReadTimeout(5000)
      try {
        val status = conn.getResponseCode
        val stream =
          if (status == 200) conn.getInputStream else conn.getErrorStream
        val body =
          if (stream == null) ""
          else try new String(stream.readAllBytes(),
            java.nio.charset.StandardCharsets.UTF_8)
          finally stream.close()
        ProbeResult(status, body)
      } finally conn.disconnect()
    } catch {
      case e: java.io.IOException =>
        throw new IllegalStateException(
          s"Cannot connect to ClickHouse server using HTTP on $host:$port", e)
    }
  }

  /** Process-level cache of live discovery results keyed by
    * (coordinator URL, cluster name): on the driver the topology is
    * resolved once at plan time; a writer task that resolves again on
    * an executor pays one system.clusters query per JVM, not per task.
    */
  private val discovered = new java.util.concurrent.ConcurrentHashMap[
    (String, String), Seq[ShardNode]]()

  /** Production resolution — the reference's getLocalNodes fallback
    * (ClickHouseConnectionProvider.java:85-93): an explicit
    * `sink.write-local-nodes` list wins; otherwise write-local mode
    * queries the coordinator's system.clusters LIVE through the JDBC
    * runner + HTTP probe (cached per JVM). Without write-local there is
    * no topology to discover. A discovery failure propagates as
    * IllegalStateException rather than silently degrading to
    * coordinator-only writes.
    */
  def resolveLive(options: GraftSinkOptions): Seq[ShardNode] =
    options.writeLocalNodes.map(parse).getOrElse {
      if (!options.writeLocal) Seq.empty
      else discovered.computeIfAbsent(
        (options.url, options.clusterName),
        { case (url, cluster) =>
          discover(cluster, jdbcQueryRunner(url), httpProbe) })
    }

  /** Live query runner: prepared statement against the coordinator via
    * plain JDBC (the same DriverManager path JdbcStatementExecutor
    * uses), parameter bound positionally like the reference's
    * stmt.setString(1, clusterName).
    */
  def jdbcQueryRunner(coordinatorUrl: String)(
      sql: String, clusterName: String): Seq[ClusterRow] = {
    val conn = java.sql.DriverManager.getConnection(coordinatorUrl)
    try {
      val stmt = conn.prepareStatement(sql)
      try {
        stmt.setString(1, clusterName)
        val rs = stmt.executeQuery()
        val buf = scala.collection.mutable.ArrayBuffer.empty[ClusterRow]
        while (rs.next())
          buf += ClusterRow(rs.getInt("shard_num"),
            rs.getString("host_address"), rs.getInt("port"))
        buf.toSeq
      } finally stmt.close()
    } finally conn.close()
  }

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

  /** Topology for a write: explicit nodes win (getLocalNodes precedence,
    * ClickHouseConnectionProvider.java:85-93); otherwise run discovery
    * through the injected seams. The default seams are the live JDBC
    * runner + HTTP probe; `resolve(options)` with no seams keeps the
    * offline behavior (no cluster to query → empty topology).
    */
  def resolve(options: GraftSinkOptions,
              runQuery: Option[(String, String) => Seq[ClusterRow]] = None,
              probe: (String, Int) => ProbeResult = httpProbe)
      : Seq[ShardNode] =
    options.writeLocalNodes.map(parse).getOrElse {
      runQuery match {
        case Some(rq) => discover(options.clusterName, rq, probe)
        case None => Seq.empty
      }
    }

  /** The JDBC URL a given shard partition writes to: its local node in
    * write-local mode with a configured topology, the coordinator URL
    * otherwise (one executor+connection per shard,
    * ClickHouseShardOutputFormat.java:60-70).
    */
  def urlForShard(options: GraftSinkOptions, shard: Int): String = {
    val nodes = if (options.writeLocal) resolveLive(options) else Seq.empty
    if (nodes.isEmpty) options.url
    else nodes(((shard % nodes.size) + nodes.size) % nodes.size)
      .jdbcUrl(options.databaseName)
  }
}
