package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 fourth batch: label-propagation community detection (LPA)
  * over the part co-purchase graph — the O(m)-per-round community
  * algorithm that complements the connected-components (dedup_cc_*) and
  * modularity (q_graph_modularity) surfaces: CC finds reachability,
  * LPA finds DENSITY structure inside one component.
  *
  * Synchronous LPA, K=3 fixed rounds, fully deterministic: every node
  * adopts the most frequent label among its NEIGHBORS, ties broken by
  * the smallest label (count DESC, label ASC) — the canonical
  * tie-break that makes LPA reproducible. Each round is one join of
  * the bidirectional edge list to the label table plus one per-node
  * argmax (window over the node key): label tables shuffle on the node
  * id, edges on the endpoint — never a pairwise product, hubs are one
  * reduction key. The oracle unrolls the same 3 rounds as CTEs.
  *
  *  - q_lpa_communities: the top-20 communities by size after K=3.
  *  - q_lpa_modularity: modularity Q of the LPA partition — computed
  *    as Q = A/m - B/(4 m^2) with A = intra-community edges and
  *    B = sum of squared community degree totals, both EXACT integer
  *    aggregates (decimal for B), so the one subtraction of two
  *    mirrored divisions is engine-identical (never a float sum over
  *    communities).
  *  - q_community_size_dist: log2-bucketed community size histogram.
  */
object Round10dQueries {

  private val K = 3

  /** Final LPA labels after K synchronous rounds: (v, lbl). */
  private def lpaLabels(s: SparkSession, dir: String): DataFrame = {
    val e = graft.CacheScope.retain(Round5gQueries.coEdges(s, dir))
    val bidir = graft.CacheScope.retain(
      e.select(col("a").as("u"), col("b").as("nb"))
        .unionAll(e.select(col("b").as("u"), col("a").as("nb"))))
    val nodes = bidir.select(col("u").as("v")).distinct()
    var labels = nodes.withColumn("lbl", col("v"))
    for (_ <- 1 to K) {
      // r12 optimization (guide §2.3/§4): the per-round argmax
      // (count DESC, label ASC) is a single-LONG max — the old
      // row_number() window sorted the whole (u, lbl, c) table each
      // round (3 rounds × Sort+Window). The ordering is packed as
      // (c << 32) | (2^32-1 − lbl): max picks max c, then min lbl —
      // exactly the canonical LPA tie-break — and a one-long buffer
      // keeps BOTH aggregates whole-stage-codegen HashAggregates
      // (min(struct(-c, lbl)) was tried first and planned a
      // SortAggregate, re-sorting the joined stream by u map-side:
      // slower than the window it replaced). Pack preconditions are
      // guarded loud, the ktruss idiom: c < 2^31 (a count of neighbors
      // of one node) and 0 <= lbl < 2^32 (node ids; the ktruss packer
      // asserts the same domain).
      val m = lit(0xFFFFFFFFL)
      val packed = when(col("c") < lit(1L << 31) &&
          col("lbl") >= 0 && col("lbl") <= m,
        shiftleft(col("c"), 32).bitwiseOR(m - col("lbl")))
        .otherwise(raise_error(concat(lit("lpa argmax pack overflow: "),
          col("c").cast("string"), lit(","), col("lbl").cast("string")))
          .cast("long"))
      // SHUFFLE_HASH with the label table as build: |V| rows ≤ |E| rows
      // per partition, no sort of either side. Pinned explicitly —
      // the r12 coEdges rewrite shrank the edge frame's size ESTIMATE
      // and Catalyst started BROADCASTING the 2.4M-row bidir edge list
      // into every round's join (a scale-killer the contract gate can't
      // see: broadcasts counted 1 either way).
      labels = bidir
        .join(labels.withColumnRenamed("v", "nb").hint("SHUFFLE_HASH"),
          "nb")
        .groupBy("u", "lbl").agg(count(lit(1)).as("c"))
        .groupBy("u").agg(max(packed).as("p"))
        .select(col("u").as("v"),
          (m - col("p").bitwiseAND(m)).as("lbl"))
    }
    labels
  }

  /** The same K rounds as DuckDB CTEs ending in `l$K(v, lbl)`;
    * callers append their final select.
    */
  private def lpaSql(): String = {
    val rounds = (1 to K).map { i =>
      s"""n$i AS (
         |  SELECT b.u, l.lbl, COUNT(*) AS c
         |  FROM bidir b JOIN l${i - 1} l ON b.nb = l.v
         |  GROUP BY b.u, l.lbl
         |), l$i AS (
         |  SELECT u AS v, lbl FROM (
         |    SELECT u, lbl,
         |      ROW_NUMBER() OVER (PARTITION BY u ORDER BY c DESC, lbl) AS rn
         |    FROM n$i) WHERE rn = 1
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH e AS (
       |  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
       |  FROM lineitem x JOIN lineitem y
       |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
       |), bidir AS (
       |  SELECT a AS u, b AS nb FROM e
       |  UNION ALL SELECT b, a FROM e
       |), l0 AS (
       |  SELECT DISTINCT u AS v, u AS lbl FROM bidir
       |), $rounds""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_lpa_communities" -> ((s, dir) =>
      lpaLabels(s, dir)
        .groupBy("lbl").agg(count(lit(1)).as("size"))
        .orderBy(col("size").desc, col("lbl").asc)
        .limit(20)
        .select(col("lbl").as("community"), col("size"))),

    "q_lpa_modularity" -> ((s, dir) => {
      val labels = graft.CacheScope.retain(lpaLabels(s, dir))
      val e = Round5gQueries.coEdges(s, dir)
      val m = e.agg(count(lit(1)).as("m"))
      // A: edges whose endpoints share a label (exact long)
      val intra = e
        .join(labels.select(col("v").as("a"), col("lbl").as("la")), "a")
        .join(labels.select(col("v").as("b"), col("lbl").as("lb")), "b")
        .agg(sum(when(col("la") === col("lb"), 1L).otherwise(0L))
          .as("intra_edges"))
      // B: sum over communities of (degree total)^2 (exact decimal)
      val deg = e.select(col("a").as("v"))
        .unionAll(e.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("d"))
      val degSq = deg.join(labels, "v")
        .groupBy("lbl").agg(sum(col("d")).as("dc"))
        .agg(sum((col("dc") * col("dc")).cast("decimal(38,0)"))
          .as("sum_deg_sq"))
      m.join(broadcast(intra)).join(broadcast(degSq))
        .select(col("m").as("n_edges"), col("intra_edges"),
          col("sum_deg_sq").cast("string").cast("double").as("b_exact"))
        .select(col("n_edges"), col("intra_edges"),
          (col("intra_edges").cast("double") / col("n_edges").cast("double")
            - col("b_exact") / (lit(4.0) * col("n_edges").cast("double")
              * col("n_edges").cast("double"))).as("modularity"))
    }),

    "q_community_size_dist" -> ((s, dir) =>
      lpaLabels(s, dir)
        .groupBy("lbl").agg(count(lit(1)).as("size"))
        .groupBy((length(bin(col("size"))) - 1).cast("int").as("log2_size"))
        .agg(count(lit(1)).as("n_communities"),
          sum(col("size")).as("total_members"))
        .orderBy("log2_size")))

  val oracle: Map[String, String] = Map(

    "q_lpa_communities" ->
      s"""${lpaSql()}
         |SELECT lbl AS community, CAST(COUNT(*) AS BIGINT) AS size
         |FROM l$K GROUP BY lbl
         |ORDER BY size DESC, community ASC LIMIT 20""".stripMargin,

    "q_lpa_modularity" ->
      s"""${lpaSql()},
         |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM e),
         |intra AS (
         |  SELECT CAST(SUM(CASE WHEN la.lbl = lb.lbl THEN 1 ELSE 0 END)
         |    AS BIGINT) AS intra_edges
         |  FROM e JOIN l$K la ON e.a = la.v JOIN l$K lb ON e.b = lb.v
         |), degsq AS (
         |  SELECT CAST(CAST(SUM(CAST(dc * dc AS DECIMAL(38,0))) AS VARCHAR)
         |    AS DOUBLE) AS b_exact
         |  FROM (
         |    SELECT l.lbl, SUM(d) AS dc FROM (
         |      SELECT v, COUNT(*) AS d FROM (
         |        SELECT a AS v FROM e UNION ALL SELECT b FROM e
         |      ) GROUP BY v
         |    ) dv JOIN l$K l ON dv.v = l.v GROUP BY l.lbl
         |  )
         |)
         |SELECT n_edges, intra_edges,
         |  CAST(intra_edges AS DOUBLE) / CAST(n_edges AS DOUBLE)
         |    - b_exact / (4.0 * CAST(n_edges AS DOUBLE)
         |      * CAST(n_edges AS DOUBLE)) AS modularity
         |FROM mm, intra, degsq""".stripMargin,

    "q_community_size_dist" ->
      s"""${lpaSql()},
         |sizes AS (
         |  SELECT lbl, CAST(COUNT(*) AS BIGINT) AS size
         |  FROM l$K GROUP BY lbl
         |)
         |SELECT CAST(LENGTH(BIN(size)) - 1 AS INTEGER) AS log2_size,
         |  CAST(COUNT(*) AS BIGINT) AS n_communities,
         |  CAST(SUM(size) AS BIGINT) AS total_members
         |FROM sizes GROUP BY 1 ORDER BY log2_size""".stripMargin)
}
