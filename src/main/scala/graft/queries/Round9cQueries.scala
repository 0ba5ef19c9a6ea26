package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 third batch: ANN index-shape evaluation — the SPANN-style
  * boundary-closure assignment and the IVF probe-tuning curve, the two
  * measurements that decide an ANN deployment's memory/recall point
  * before anything ships (SPANN: Chen et al., NeurIPS 2021 — posting
  * lists with multi-assignment of boundary vectors; IVF probe sweep:
  * the standard FAISS nprobe tuning loop).
  *
  *  - ann_spann_closure: assign every vector to its nearest label-cell
  *    centroid AND to every cell whose cosine distance is within 1.2×
  *    of the nearest (relative-distance closure, ε=0.2) — per cell:
  *    primary population, closure replicas, blowup. The storage-cost
  *    side of the SPANN trade.
  *  - ann_spann_recall: recall@10 of a single-probe search against the
  *    closure-replicated index, per probe (10 probes) — the quality
  *    side: closure replicas recover most of what nprobe=1 loses.
  *  - q_ann_probe_sweep: plain-IVF recall@10 and candidate count at
  *    nprobe ∈ {1,2,4} averaged over the probe set — the tuning curve
  *    (recall must be monotone in nprobe; the spec pins it).
  *
  * Determinism: centroids fold in explicit vec_id order (bitwise-stable
  * means, the ann_ivf_topk construction); every dot product is the
  * left-to-right 64-dim double fold both engines mirror; rank
  * tie-breaks are total orders (sim DESC, vec_id ASC). Scale posture:
  * probes and centroids broadcast; the per-(probe, vector) sim frame is
  * |probes| × corpus with the codegen'd fold — the documented exact
  * evaluation arm every ANN deployment runs on a sample; the index
  * arms' search work is bucket-local, never corpus × corpus.
  */
object Round9cQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = {
    graft.expressions.VectorExpressions.register(s)
    graft.Tables(s, dir, n)
  }

  private def dotD(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dotD(a, b) // float x float, codegen'd
  private def normD(a: Column): Column = sqrt(dotD(a, a))
  // centroid arms are array<double>: same left-to-right fold the SQL
  // mirrors, spelled with zip_with/aggregate (VectorDotProduct is
  // float-only)
  private def dotDD(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
  private def dotFD(f: Column, d: Column): Column =
    aggregate(zip_with(f, d, (x, y) => x.cast("double") * y), lit(0.0),
      (acc, v) => acc + v)
  private def normDD(a: Column): Column = sqrt(dotDD(a, a))

  /** Label-cell centroids from the explicit vec_id-ordered fold —
    * identical construction to ann_ivf_topk (PipelineQueries.scala).
    */
  private def cents(e: DataFrame): DataFrame =
    e.groupBy("label").agg(
        sort_array(collect_list(struct(col("vec_id"), col("embedding"))))
          .as("vs"),
        count(lit(1)).as("n"))
      .select(col("label").as("c_label"),
        transform(sequence(lit(1), lit(64)), i =>
          aggregate(col("vs"), lit(0.0), (acc, v) =>
            acc + element_at(v.getField("embedding"), i).cast("double"))
            / col("n")).as("c"))

  /** (vec_id, label, c_label, sim): cosine of every vector to every
    * centroid; centroids broadcast. All cosines use try_divide — a
    * zero-norm vector yields sim = NULL (DuckDB's x/0), never an ANSI
    * error (the adversarial fixture holds an all-zero embedding).
    */
  private def vecCellSims(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    // spread the probe-side scan (guide §2.5): the sf parquet is one
    // row group, so the |vectors| x |cells| interpreted-lambda cosine
    // fold otherwise runs on a single task; the centroid arm keeps the
    // raw scan (a tiny grouped aggregate)
    PipelineQueries.spread(s, e)
      .select(col("vec_id"), col("label"), col("embedding"),
        normD(col("embedding")).as("nrm"))
      .crossJoin(broadcast(cents(e).withColumn("cn", normDD(col("c")))))
      .select(col("vec_id"), col("label"), col("c_label"),
        try_divide(dotFD(col("embedding"), col("c")),
          col("nrm") * col("cn")).as("sim"))
  }

  /** SPANN assignment: rank cells per vector; keep rank 1 (primary) and
    * any cell with (1−sim) ≤ 1.2·(1−sim_best) (closure replica).
    */
  private def spannAssign(s: SparkSession, dir: String): DataFrame = {
    val byVec = Window.partitionBy("vec_id")
      .orderBy(col("sim").desc, col("c_label").asc)
    vecCellSims(s, dir)
      .withColumn("rnk", row_number().over(byVec))
      .withColumn("best_sim", first(col("sim")).over(byVec))
      .filter(col("rnk") === 1 ||
        (lit(1.0) - col("sim")) <= lit(1.2) * (lit(1.0) - col("best_sim")))
  }

  private def probes(e: DataFrame): DataFrame =
    e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("pid"), col("embedding").as("pe"),
        normD(col("embedding")).as("pn"))

  /** (pid, vec_id, label, sim) for every probe × non-self vector. */
  private def probeSims(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    // spread: |probes| x corpus dot products off a 1-row-group scan
    // otherwise evaluate on one task (guide §2.5)
    PipelineQueries.spread(s, e)
      .select(col("vec_id"), col("label"), col("embedding"),
        normD(col("embedding")).as("nrm"))
      .crossJoin(broadcast(probes(e)))
      .filter(col("vec_id") =!= col("pid"))
      .select(col("pid"), col("vec_id"), col("label"),
        try_divide(dotD(col("embedding"), col("pe")),
          col("nrm") * col("pn")).as("sim"))
  }

  /** Exact top-10 neighbor ids per probe. */
  private def exactTop(ps: DataFrame): DataFrame = {
    val w = Window.partitionBy("pid")
      .orderBy(col("sim").desc, col("vec_id").asc)
    ps.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 10)
      .select(col("pid"), col("vec_id"))
  }

  /** Per-probe ranked centroid cells (by centroid cosine). */
  private def probeCells(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val byProbe = Window.partitionBy("pid")
      .orderBy(col("csim").desc, col("c_label").asc)
    broadcast(probes(e))
      .crossJoin(broadcast(cents(e).withColumn("cn", normDD(col("c")))))
      .select(col("pid"), col("c_label"),
        try_divide(dotFD(col("pe"), col("c")), col("pn") * col("cn"))
          .as("csim"))
      .withColumn("cell_rnk", row_number().over(byProbe))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "ann_spann_closure" -> ((s, dir) => {
      val a = spannAssign(s, dir)
      a.groupBy(col("c_label"))
        .agg(
          sum(when(col("rnk") === 1, 1L).otherwise(0L)).as("n_primary"),
          sum(when(col("rnk") =!= 1, 1L).otherwise(0L)).as("n_closure"),
          count(lit(1)).as("n_total"))
        .withColumn("blowup",
          col("n_total").cast("double") / greatest(col("n_primary"), lit(1L))
            .cast("double"))
        .orderBy("c_label")
    }),

    "ann_spann_recall" -> ((s, dir) => {
      val ps = graft.CacheScope.retain(probeSims(s, dir))
      val exact = exactTop(ps)
      // search arm: candidates = vectors whose SPANN assignment
      // (primary or closure) includes the probe's top-1 cell
      val top1 = probeCells(s, dir).filter(col("cell_rnk") === 1)
        .select(col("pid"), col("c_label"))
      val cands = spannAssign(s, dir)
        .select(col("vec_id").as("cand_id"), col("c_label")).distinct()
        .join(top1, "c_label")
      val wS = Window.partitionBy("pid")
        .orderBy(col("sim").desc, col("vec_id").asc)
      val searched = ps.join(cands,
          ps("pid") === cands("pid") && ps("vec_id") === cands("cand_id"))
        .select(ps("pid"), col("vec_id"), col("sim"))
        .withColumn("rnk", row_number().over(wS)).filter(col("rnk") <= 10)
      val hits = exact.as("e").join(searched.as("f"),
          col("e.pid") === col("f.pid") &&
            col("e.vec_id") === col("f.vec_id"))
        .groupBy(col("e.pid").as("pid")).agg(count(lit(1)).as("hits"))
      val nc = cands.groupBy("pid").agg(count(lit(1)).as("n_candidates"))
      exact.select("pid").distinct()
        .join(nc, Seq("pid"), "left")
        .join(hits, Seq("pid"), "left")
        .select(col("pid"),
          coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
          coalesce(col("hits"), lit(0L)).as("hits"),
          (coalesce(col("hits"), lit(0L)).cast("double") / lit(10.0))
            .as("recall"))
        .orderBy("pid")
    }),

    "q_ann_probe_sweep" -> ((s, dir) => {
      val ps = graft.CacheScope.retain(probeSims(s, dir))
      val exact = graft.CacheScope.retain(exactTop(ps))
      val cells = probeCells(s, dir)
      val grid = cells.crossJoin(
          broadcast(s.range(1, 2).select(
            explode(array(lit(1), lit(2), lit(4))).as("nprobe"))))
        .filter(col("cell_rnk") <= col("nprobe"))
        .select(col("pid"), col("c_label").as("label"), col("nprobe"))
      val wS = Window.partitionBy("pid", "nprobe")
        .orderBy(col("sim").desc, col("vec_id").asc)
      val cand = ps.join(grid, Seq("pid", "label"))
      val searched = cand
        .withColumn("rnk", row_number().over(wS)).filter(col("rnk") <= 10)
      val hits = exact.as("e").join(searched.as("f"),
          col("e.pid") === col("f.pid") &&
            col("e.vec_id") === col("f.vec_id"))
        .groupBy(col("f.nprobe").as("nprobe"))
        .agg(count(lit(1)).as("total_hits"))
      val scanned = cand.groupBy("nprobe")
        .agg(count(lit(1)).as("total_candidates"))
      scanned.join(hits, Seq("nprobe"), "left")
        .select(col("nprobe"),
          coalesce(col("total_hits"), lit(0L)).as("total_hits"),
          (coalesce(col("total_hits"), lit(0L)).cast("double") / lit(100.0))
            .as("avg_recall"),
          (col("total_candidates").cast("double") / lit(10.0))
            .as("avg_candidates"))
        .orderBy("nprobe")
    }))

  import PipelineQueries.{dotSql, normSql}

  /** Shared oracle CTEs: centroids, per-vector cell sims, SPANN
    * assignment, probes, probe sims, exact top-10, probe cell ranks.
    */
  private val baseCte =
    s"""WITH vs AS (
       |  SELECT label, list(embedding ORDER BY vec_id) AS vs, COUNT(*) AS n
       |  FROM embeddings GROUP BY label
       |), cent AS (
       |  SELECT label AS c_label,
       |    [list_sum(list_transform(vs, v -> CAST(v[i] AS DOUBLE))) / n
       |      FOR i IN range(1, 65)] AS c
       |  FROM vs
       |), vc AS (
       |  SELECT e.vec_id, e.label, t.c_label,
       |    ${dotSql("e.embedding", "t.c")}
       |      / (${normSql("e.embedding")} * ${normSql("t.c")}) AS sim
       |  FROM embeddings e, cent t
       |), vcr AS (
       |  SELECT vec_id, label, c_label, sim,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY sim DESC, c_label ASC) AS rnk,
       |    FIRST_VALUE(sim) OVER (PARTITION BY vec_id
       |      ORDER BY sim DESC, c_label ASC) AS best_sim
       |  FROM vc
       |), assign AS (
       |  SELECT * FROM vcr
       |  WHERE rnk = 1 OR (1.0 - sim) <= 1.2 * (1.0 - best_sim)
       |), p AS (
       |  SELECT vec_id AS pid, embedding AS pe FROM embeddings
       |  WHERE vec_id < 10
       |), psim AS (
       |  SELECT p.pid, e.vec_id, e.label,
       |    ${dotSql("e.embedding", "p.pe")}
       |      / (${normSql("e.embedding")} * ${normSql("p.pe")}) AS sim
       |  FROM embeddings e, p WHERE e.vec_id <> p.pid
       |), exact AS (
       |  SELECT pid, vec_id FROM (
       |    SELECT pid, vec_id,
       |      ROW_NUMBER() OVER (PARTITION BY pid
       |        ORDER BY sim DESC, vec_id ASC) AS rnk
       |    FROM psim) WHERE rnk <= 10
       |), pcell AS (
       |  SELECT p.pid, t.c_label,
       |    ROW_NUMBER() OVER (PARTITION BY p.pid ORDER BY
       |      ${dotSql("p.pe", "t.c")}
       |        / (${normSql("p.pe")} * ${normSql("t.c")}) DESC,
       |      t.c_label ASC) AS cell_rnk
       |  FROM p, cent t
       |)""".stripMargin

  val oracle: Map[String, String] = Map(

    "ann_spann_closure" -> (baseCte +
      """
        |SELECT c_label,
        |  CAST(SUM(CASE WHEN rnk = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_primary,
        |  CAST(SUM(CASE WHEN rnk <> 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_closure,
        |  CAST(COUNT(*) AS BIGINT) AS n_total,
        |  CAST(COUNT(*) AS DOUBLE)
        |    / CAST(GREATEST(SUM(CASE WHEN rnk = 1 THEN 1 ELSE 0 END), 1)
        |        AS DOUBLE) AS blowup
        |FROM assign GROUP BY c_label ORDER BY c_label""".stripMargin),

    "ann_spann_recall" -> (baseCte +
      """,
        |top1 AS (SELECT pid, c_label FROM pcell WHERE cell_rnk = 1),
        |cands AS (
        |  SELECT t.pid, a.cand_id FROM top1 t JOIN (
        |    SELECT DISTINCT vec_id AS cand_id, c_label FROM assign) a
        |    USING (c_label)
        |), searched AS (
        |  SELECT pid, vec_id FROM (
        |    SELECT s.pid, s.vec_id,
        |      ROW_NUMBER() OVER (PARTITION BY s.pid
        |        ORDER BY s.sim DESC, s.vec_id ASC) AS rnk
        |    FROM psim s JOIN cands c
        |      ON s.pid = c.pid AND s.vec_id = c.cand_id)
        |  WHERE rnk <= 10
        |), hits AS (
        |  SELECT e.pid, CAST(COUNT(*) AS BIGINT) AS hits
        |  FROM exact e JOIN searched f
        |    ON e.pid = f.pid AND e.vec_id = f.vec_id
        |  GROUP BY e.pid
        |), nc AS (
        |  SELECT pid, CAST(COUNT(*) AS BIGINT) AS n_candidates
        |  FROM cands GROUP BY pid
        |)
        |SELECT u.pid, COALESCE(nc.n_candidates, 0) AS n_candidates,
        |  COALESCE(h.hits, 0) AS hits,
        |  CAST(COALESCE(h.hits, 0) AS DOUBLE) / 10.0 AS recall
        |FROM (SELECT DISTINCT pid FROM exact) u
        |LEFT JOIN nc ON u.pid = nc.pid
        |LEFT JOIN hits h ON u.pid = h.pid
        |ORDER BY u.pid""".stripMargin),

    "q_ann_probe_sweep" -> (baseCte +
      """,
        |grid AS (
        |  SELECT pid, c_label AS label, nprobe
        |  FROM pcell, (SELECT UNNEST([1, 2, 4]) AS nprobe)
        |  WHERE cell_rnk <= nprobe
        |), cand AS (
        |  SELECT s.pid, s.vec_id, s.sim, g.nprobe
        |  FROM psim s JOIN grid g ON s.pid = g.pid AND s.label = g.label
        |), searched AS (
        |  SELECT pid, vec_id, nprobe FROM (
        |    SELECT pid, vec_id, nprobe,
        |      ROW_NUMBER() OVER (PARTITION BY pid, nprobe
        |        ORDER BY sim DESC, vec_id ASC) AS rnk
        |    FROM cand) WHERE rnk <= 10
        |), hits AS (
        |  SELECT f.nprobe, CAST(COUNT(*) AS BIGINT) AS total_hits
        |  FROM exact e JOIN searched f
        |    ON e.pid = f.pid AND e.vec_id = f.vec_id
        |  GROUP BY f.nprobe
        |), scanned AS (
        |  SELECT nprobe, CAST(COUNT(*) AS BIGINT) AS total_candidates
        |  FROM cand GROUP BY nprobe
        |)
        |SELECT s.nprobe, COALESCE(h.total_hits, 0) AS total_hits,
        |  CAST(COALESCE(h.total_hits, 0) AS DOUBLE) / 100.0 AS avg_recall,
        |  CAST(s.total_candidates AS DOUBLE) / 10.0 AS avg_candidates
        |FROM scanned s LEFT JOIN hits h ON s.nprobe = h.nprobe
        |ORDER BY s.nprobe""".stripMargin))
}
