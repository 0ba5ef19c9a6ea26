package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5g batch: graph structure, mergeable-sketch algebra, and the
  * modern SQL sugar surface — triangle counting with degree-ordered
  * orientation (the at-scale wedge bound), KMV sketch UNION (the
  * mergeability property that makes sketches composable across
  * partitions/days — exactly what HLL gives up being non-invertible),
  * DISTINCT ON as a map-side `max_by` (no per-key sort), deterministic
  * MODE with a total tie-break, and GROUP BY ALL / ORDER BY ALL.
  *
  * Determinism rules (see Round5Queries): integer counts and md5-derived
  * hashes; every double shown is a single division mirrored literally
  * in the oracle.
  */
object Round5gQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    graft.Tables(s, dir, n)

  /** Distinct undirected co-purchase edges (a < b): two parts that
    * appear on the same order. The self-join is per-order (equi on
    * l_orderkey) so pair generation is quadratic only in lines-per-order
    * (bounded small by the data model), never in corpus size.
    */
  private[queries] def coEdges(s: SparkSession, dir: String): DataFrame = {
    // r12 optimization (guide §2.4/§3): pair enumeration happens INSIDE
    // the per-order group — one groupBy(orderkey) with map-side partial
    // collect_set, then an in-memory pair expansion over the sorted
    // array (orders are bounded-small: ≤7 lines), then the same distinct.
    // The old self-join shape shuffled lineitem by orderkey and SORTED
    // BOTH sort-merge sides (exchange reuse dedups the shuffle, not the
    // sorts); this shape has no join at all. sort_array makes the
    // collect_set order deterministic and gives a < b by construction —
    // the (a, b) pair set is identical to the join's.
    val li = t(s, dir, "lineitem").select("l_orderkey", "l_partkey")
    li.groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .select(explode(flatten(transform(col("ps"), (a, i) =>
        transform(slice(col("ps"), i + 2, size(col("ps"))), b =>
          struct(a.as("a"), b.as("b")))))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .distinct()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Triangle census of the part co-purchase graph: node/edge counts,
    // wedge count Σ d(d−1)/2 (exact integers — d(d−1) is even so the
    // integral div is lossless), triangle count, and the global
    // clustering coefficient 3T/W (the one double division, mirrored).
    //
    // Scale posture: edges are ORIENTED lower-(degree, id) → higher
    // before wedge generation, so every wedge is generated at its
    // lowest-degree endpoint — out-degrees are O(√m)-bounded under this
    // orientation (standard triangle-counting bound) and the wedge join
    // never explodes on a hub node. The oracle counts id-oriented
    // triangles: orientation changes the intermediate sizes, never the
    // triangle set.
    "graph_triangles" -> ((s, dir) => {
      // e feeds 3 consumers (degree table, orientation join, edge
      // count) and deg feeds 3 (two orientation joins, the stats agg):
      // without a retain each consumer re-derives the lineitem
      // self-join + 1.2M-pair distinct from scratch — the re-derivation,
      // not the intersect, is most of this query's task CPU. Retained
      // frames release with the scope after the consuming action.
      val e = graft.CacheScope.retain(coEdges(s, dir))
      val deg = graft.CacheScope.retain(
        e.select(col("a").as("v"))
          .unionAll(e.select(col("b").as("v")))
          .groupBy("v").agg(count(lit(1)).as("d")))
      // orient each edge from the smaller (degree, id) endpoint
      val keyed = e
        .join(deg.withColumnRenamed("v", "a").withColumnRenamed("d", "da"), "a")
        .join(deg.withColumnRenamed("v", "b").withColumnRenamed("d", "db"), "b")
      val oriented = keyed.select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          struct(col("a").as("src"), col("b").as("dst"),
            col("db").as("dd"), col("b").as("di")))
          .otherwise(
            struct(col("b").as("src"), col("a").as("dst"),
              col("da").as("dd"), col("a").as("di"))).as("o"))
        .select(col("o.src").as("src"), col("o.dst").as("dst"),
          col("o.dd").as("dd"), col("o.di").as("di"))
      // triangle closing via adjacency intersection (edge-iterator):
      // for each oriented edge (u,v), triangles with apex u are the
      // common OUT-neighbors |N⁺(u) ∩ N⁺(v)| — u→v given, u→w and v→w
      // from the lists. This never materializes the wedge set as rows
      // (Σ outdeg² — 41M at sf0.1, 34× the edge count): the intersect
      // runs inside one expression over the 1.2M edge rows, and the
      // out-lists are O(√m)-bounded per node by the orientation (max
      // out-degree 97 here), so each array payload stays small. Lists
      // are SORTED once per node so the per-edge intersect is a
      // primitive two-pointer merge (graft_lsorted_intersect_size) —
      // array_intersect's per-row boxed hash set was this query's
      // dominant CPU cost (r7: 70-120 s of task time at sf0.1).
      graft.expressions.LongArrayExpressions.register(s)
      val adjOut = oriented.groupBy(col("src").as("u"))
        .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
      val triangles = oriented
        .join(adjOut, col("src") === col("u"))
        .join(adjOut.select(col("u").as("u2"), col("nbrs").as("nbrs2")),
          col("dst") === col("u2"), "left") // sink nodes have no out-list
        .select(call_function("graft_lsorted_intersect_size", col("nbrs"),
          coalesce(col("nbrs2"), array().cast("array<bigint>"))).as("c"))
        // coalesce: an edgeless graph SUMs over nothing — 0 triangles,
        // like the oracle's COUNT(*), not NULL
        .agg(coalesce(sum(col("c")), lit(0L)).cast("long")
          .as("n_triangles"))
      val stats = deg.agg(
        count(lit(1)).as("n_nodes"),
        (sum(col("d") * (col("d") - 1)) / 2).cast("long").as("n_wedges"))
      val edges = e.agg(count(lit(1)).as("n_edges"))
      stats.join(broadcast(edges)).join(broadcast(triangles))
        // try_divide: a graph with no wedges (all degrees 1) has an
        // undefined clustering coefficient — NULL, like DuckDB's x/0
        .withColumn("global_cc",
          try_divide((col("n_triangles") * 3).cast("double"),
            col("n_wedges")))
        .select("n_nodes", "n_edges", "n_wedges", "n_triangles", "global_cc")
    }),

    // KMV sketch UNION — the mergeability demo: per-type bottom-8
    // sketches over md5(user_id) hashes, then the union sketch of
    // click∪purchase computed FROM THE TWO SKETCHES ALONE (bottom-8 of
    // the union of bottom-8s — the KMV closure property). Estimates
    // (k−1)·2³² / kth_min for each sketch, inclusion–exclusion for the
    // intersection, and the exact union distinct count alongside. At
    // 100 TB the per-partition/per-day sketches are 64 bytes each and
    // re-merge losslessly — the property that makes distinct-count
    // dashboards additive.
    "q_kmv_union" -> ((s, dir) => {
      val k = 8
      val bottomK = udaf(new graft.functions.TopKAggregator(k))
      val u = conv(substring(md5(col("user_id").cast("string")), 1, 8),
        16, 10).cast("long")
      val base = t(s, dir, "events")
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("event_type"), u.as("u")).distinct()
      // per-type sketch: k smallest hashes (score = -u keeps smallest;
      // exact in double since u < 2^32 << 2^53)
      val sk = base.groupBy("event_type")
        .agg(bottomK(-col("u").cast("double"), col("u")).as("mins"))
      def kth(c: Column): Column = element_at(c, k).getField("id")
      val est: Column => Column =
        m => lit(((k - 1).toLong * 4294967296L).toDouble) / kth(m)
      val wide = sk.groupBy()
        .pivot("event_type", Seq("click", "purchase")).agg(first("mins"))
      // union sketch from the two sketches alone (no data re-read):
      // merge both k-entry arrays, dedup, keep the k smallest
      val merged = slice(array_sort(array_distinct(concat(
        transform(col("click"), e => e.getField("id")),
        transform(col("purchase"), e => e.getField("id"))))), 1, k)
      val exact = base.select("u").distinct()
        .agg(count(lit(1)).as("exact_union"))
      wide
        // both sketches must be FULL (>= k distinct hashes): the oracle
        // selects the exact k-th entry per arm, so a corpus missing
        // either arm (or under k distinct users) yields ZERO rows on
        // both engines rather than a partial-sketch estimate
        .filter(size(col("click")) >= k && size(col("purchase")) >= k)
        .select(
          kth(col("click")).as("kth_click"),
          kth(col("purchase")).as("kth_purchase"),
          element_at(merged, k).as("kth_union"),
          est(col("click")).as("est_click"),
          est(col("purchase")).as("est_purchase"),
          (lit(((k - 1).toLong * 4294967296L).toDouble) /
            element_at(merged, k)).as("est_union"))
        .withColumn("est_intersection",
          col("est_click") + col("est_purchase") - col("est_union"))
        .join(broadcast(exact))
    }),

    // DISTINCT ON (user_id): the latest event per user — computed as a
    // map-side max_by over the (ts, event_id) order key, NOT a
    // row_number window: the aggregate partially combines (one
    // candidate row per user per map partition crosses the shuffle)
    // while the window form shuffles and sorts every event of every
    // user. The (us, event_id) key is total, so the pick is
    // deterministic.
    "q_distinct_on" -> ((s, dir) =>
      t(s, dir, "events")
        .withColumn("us", unix_micros(col("ts")))
        .groupBy("user_id")
        .agg(max_by(
          struct(col("event_id"), col("event_type"), col("value"),
            col("us")),
          struct(col("us"), col("event_id"))).as("r"))
        .select(col("user_id"), col("r.event_id").as("event_id"),
          col("r.event_type").as("event_type"),
          col("r.value").as("value"), col("r.us").as("last_us"))
        .orderBy("user_id")),

    // Deterministic MODE per group: the most frequent quantity per
    // return flag, ties broken toward the SMALLEST value (SQL mode()
    // leaves ties undefined — a total tie-break is what makes the
    // result testable). Two map-side-combined aggregates: value counts,
    // then argmax by (count DESC, value ASC) via max_by over a
    // lexicographic struct — no per-group sort of raw rows.
    "q_mode" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy("l_returnflag")
        .agg(
          max_by(col("l_quantity"), struct(col("cnt"), -col("l_quantity")))
            .as("mode_qty"),
          max(col("cnt")).as("mode_count"),
          count(lit(1)).as("n_distinct_values"))
        .orderBy("l_returnflag")),

    // GROUP BY ALL / ORDER BY ALL — the modern SQL sugar surface (both
    // engines infer the grouping key from the non-aggregate select
    // list). Semantically identical to the explicit form; the point is
    // surface parity. Decimal-routed sum keeps the double exact.
    "q_group_by_all" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
      s.sql("""
        SELECT l_returnflag, l_linestatus, year(l_shipdate) AS yr,
          COUNT(*) AS n,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem_v
        GROUP BY ALL
        ORDER BY ALL""")
    }),
  )

  val oracle: Map[String, String] = Map(

    "graph_triangles" ->
      """WITH e AS (
        |  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        |  FROM lineitem x JOIN lineitem y
        |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        |), deg AS (
        |  SELECT v, COUNT(*) AS d FROM (
        |    SELECT a AS v FROM e UNION ALL SELECT b FROM e
        |  ) GROUP BY 1
        |), tri AS (
        |  SELECT COUNT(*) AS n_triangles
        |  FROM e e1 JOIN e e2 ON e2.a = e1.b
        |    JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
        |)
        |SELECT
        |  (SELECT COUNT(*) FROM deg) AS n_nodes,
        |  (SELECT COUNT(*) FROM e) AS n_edges,
        |  (SELECT CAST(SUM(d * (d - 1)) / 2 AS BIGINT) FROM deg)
        |    AS n_wedges,
        |  tri.n_triangles,
        |  CAST(tri.n_triangles * 3 AS DOUBLE) /
        |    (SELECT CAST(SUM(d * (d - 1)) / 2 AS BIGINT) FROM deg)
        |    AS global_cc
        |FROM tri""".stripMargin,

    "q_kmv_union" ->
      """WITH h AS (
        |  SELECT DISTINCT event_type,
        |    list_reduce([CAST(0 AS BIGINT)] || list_transform(
        |      string_split_regex(
        |        substring(md5(CAST(user_id AS VARCHAR)), 1, 8), ''),
        |      c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
        |      (acc, v) -> acc * 16 + v) AS u
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |), r AS (
        |  SELECT event_type, u,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY u) AS rn
        |  FROM h
        |), ku AS (
        |  SELECT u, ROW_NUMBER() OVER (ORDER BY u) AS rn
        |  FROM (SELECT DISTINCT u FROM r WHERE rn <= 8)
        |), kc AS (SELECT u FROM r WHERE event_type = 'click' AND rn = 8),
        |kp AS (SELECT u FROM r WHERE event_type = 'purchase' AND rn = 8),
        |km AS (SELECT u FROM ku WHERE rn = 8),
        |ex AS (SELECT COUNT(DISTINCT u) AS exact_union FROM h)
        |SELECT kc.u AS kth_click, kp.u AS kth_purchase, km.u AS kth_union,
        |  CAST(7 * 4294967296 AS DOUBLE) / kc.u AS est_click,
        |  CAST(7 * 4294967296 AS DOUBLE) / kp.u AS est_purchase,
        |  CAST(7 * 4294967296 AS DOUBLE) / km.u AS est_union,
        |  (CAST(7 * 4294967296 AS DOUBLE) / kc.u
        |    + CAST(7 * 4294967296 AS DOUBLE) / kp.u
        |    - CAST(7 * 4294967296 AS DOUBLE) / km.u) AS est_intersection,
        |  ex.exact_union
        |FROM kc, kp, km, ex""".stripMargin,

    "q_distinct_on" ->
      """WITH r AS (
        |  SELECT user_id, event_id, event_type, value, epoch_us(ts) AS us,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events
        |)
        |SELECT user_id, event_id, event_type, value, us AS last_us
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q_mode" ->
      """WITH c AS (
        |  SELECT l_returnflag, l_quantity, COUNT(*) AS cnt
        |  FROM lineitem GROUP BY 1, 2
        |), r AS (
        |  SELECT l_returnflag, l_quantity, cnt,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |      ORDER BY cnt DESC, l_quantity) AS rn,
        |    MAX(cnt) OVER (PARTITION BY l_returnflag) AS mode_count,
        |    COUNT(*) OVER (PARTITION BY l_returnflag)
        |      AS n_distinct_values
        |  FROM c
        |)
        |SELECT l_returnflag, l_quantity AS mode_qty, mode_count,
        |  n_distinct_values
        |FROM r WHERE rn = 1 ORDER BY l_returnflag""".stripMargin,

    "q_group_by_all" ->
      """SELECT l_returnflag, l_linestatus, year(l_shipdate) AS yr,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY ALL
        |ORDER BY ALL""".stripMargin,
  )
}
