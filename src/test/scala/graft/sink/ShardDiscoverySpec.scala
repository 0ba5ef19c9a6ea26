package graft.sink

import org.scalatest.funsuite.AnyFunSuite

import graft.sink.ShardTopology.{ClusterRow, ProbeResult}

/** R16 discovery parity with ClickHouseConnectionProvider.java:95-135:
  * the system.clusters query path, the HTTP port fix-up (200 keeps the
  * advertised port; the "You must use port N for HTTP." error body
  * rewrites it), the empty-result failure, and explicit-nodes
  * precedence — all through the injected query/probe seams, no live
  * cluster needed.
  */
class ShardDiscoverySpec extends AnyFunSuite {

  private val rows = Seq(
    ClusterRow(1, "10.0.0.1", 9000),
    ClusterRow(2, "10.0.0.2", 8123))

  // probe fake: 9000 is a TCP port that names 8123 in its error body;
  // 8123 answers HTTP directly
  private def probe(host: String, port: Int): ProbeResult =
    if (port == 8123) ProbeResult(200, "Ok.")
    else ProbeResult(400, "Port 9000 is for clickhouse-client program.\n" +
      "You must use port 8123 for HTTP.")

  test("discover binds the cluster name and maps rows to ShardNodes") {
    var seen: Option[(String, String)] = None
    val nodes = ShardTopology.discover("prod_cluster",
      (sql, cluster) => { seen = Some((sql, cluster)); rows }, probe)
    assert(seen.contains((ShardTopology.DiscoveryQuery, "prod_cluster")))
    assert(nodes == Seq(
      ShardNode(1, "10.0.0.1", 8123), // 9000 rewritten by the error body
      ShardNode(2, "10.0.0.2", 8123))) // 200 keeps the advertised port
  }

  test("discovery query matches the reference SQL") {
    assert(ShardTopology.DiscoveryQuery ==
      "SELECT shard_num, host_address, port FROM system.clusters " +
        "WHERE cluster = ? and replica_num = 1")
  }

  test("empty discovery result is an error, like the reference") {
    val e = intercept[IllegalStateException](
      ShardTopology.discover("c", (_, _) => Seq.empty, probe))
    assert(e.getMessage.contains("system.clusters"))
  }

  test("unparseable probe body is an error naming host:port") {
    val e = intercept[IllegalStateException](
      ShardTopology.actualHttpPort("h", 9440,
        (_, _) => ProbeResult(500, "internal error")))
    assert(e.getMessage.contains("h:9440"))
  }

  test("explicit write-local-nodes short-circuits discovery") {
    val opts = GraftSinkOptions(
      url = "jdbc:clickhouse://coord:8123/db",
      tableName = "t",
      writeLocal = true,
      writeLocalNodes = Some("h1:8123,h2:8124"))
    var queried = false
    val nodes = ShardTopology.resolve(opts,
      runQuery = Some((_, _) => { queried = true; rows }), probe = probe)
    assert(!queried)
    assert(nodes == Seq(ShardNode(1, "h1", 8123), ShardNode(2, "h2", 8124)))
  }

  test("no nodes + a query seam runs discovery") {
    val opts = GraftSinkOptions(
      url = "jdbc:clickhouse://coord:8123/db",
      tableName = "t",
      writeLocal = true,
      clusterName = "c1")
    val nodes = ShardTopology.resolve(opts,
      runQuery = Some((_, cluster) => { assert(cluster == "c1"); rows }),
      probe = probe)
    assert(nodes.map(_.port) == Seq(8123, 8123))
  }
}
