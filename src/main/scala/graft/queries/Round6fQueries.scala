package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6f batch: pipeline self-evaluation — measuring the dedup and
  * similarity machinery against ground truth, plus corpus planning.
  *
  *  - q_dedup_pair_recall: recall/precision of the banded-LSH dedup
  *    pair finder against the exact all-pairs Jaccard truth on a fixed
  *    doc subset (the eval a pipeline runs before trusting LSH bands)
  *  - q_tokenizer_fertility: alpha-token-per-word fertility per
  *    language (the tokenizer-health ratio)
  *  - q_sampling_plan: per-language uniform-rebalance sampling rates
  *    in exact ppm integers
  *  - q_knn_label_eval: 5-NN majority-vote label propagation accuracy
  *    over the embedding space (composes similarity_knn_join)
  */
object Round6fQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    graft.Tables(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // LSH dedup recall: ground truth = ALL pairs with exact shingle
    // Jaccard ≥ 0.5 among docs with id < 300 (a FIXED subset — ~45k pairs — so the
    // all-pairs cost is bounded at any corpus scale — this is an eval
    // query, not the dedup path); predicted = the banded-minhash pair
    // finder restricted to the same subset. The ≥ 0.5 gate is the
    // integer comparison 3·inter ≥ |A|+|B| (jacc ≥ ½ ⇔ 2·inter ≥
    // |A∪B|), so truth is boundary-exact in both engines. Precision is
    // 1.0 by construction (candidates are exact-confirmed); recall
    // measures what the bands miss.
    "q_dedup_pair_recall" -> ((s, dir) => {
      val sub = 300L
      val pred = PipelineQueries.queries("dedup_minhash_pairs")(s, dir)
        .filter(col("a_id") < sub && col("b_id") < sub)
        .select("a_id", "b_id")
      val docs = t(s, dir, "documents")
        .filter(col("doc_id") < sub)
        .select(col("doc_id"),
          call_function("graft_shingles", col("text")).as("sh"))
      val a = docs.select(col("doc_id").as("a_id"), col("sh").as("sha"))
      val b = docs.select(col("doc_id").as("b_id"), col("sh").as("shb"))
      val truth = a.join(b, col("a_id") < col("b_id"))
        .withColumn("inter",
          call_function("graft_array_intersect_size",
            col("sha"), col("shb")))
        .filter(col("inter") * 3 >= size(col("sha")) + size(col("shb")))
        .select("a_id", "b_id")
      // ONE pass over the truth pairs: a left join against the (tiny)
      // candidate set marks hits, so the quadratic intersect subtree
      // is never duplicated by the count and the hit branches
      val marked = truth.join(
        broadcast(pred.withColumn("hit", lit(1L))),
        Seq("a_id", "b_id"), "left")
      val nTruth = marked.agg(count(lit(1)).as("n_truth"),
        coalesce(sum(coalesce(col("hit"), lit(0L))), lit(0L)).as("n_hit"))
      val nPred = pred.agg(count(lit(1)).as("n_pred"))
      nTruth.crossJoin(broadcast(nPred))
        .select(col("n_truth"), col("n_pred"), col("n_hit"),
          when(col("n_truth") === 0L, lit(null).cast("double"))
            .otherwise(col("n_hit").cast("double") / col("n_truth"))
            .as("recall"),
          when(col("n_pred") === 0L, lit(null).cast("double"))
            .otherwise(col("n_hit").cast("double") / col("n_pred"))
            .as("precision"))
    }),

    // Tokenizer health: alpha tokens (the BPE-ish [a-z]+ runs the
    // token counter uses) per whitespace word, and characters per
    // alpha token, per language — fertility drift flags languages the
    // tokenizer fragments.
    "q_tokenizer_fertility" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("lang"),
          size(graft.functions.TextFunctions.words(col("text")))
            .cast("long").as("n_words"),
          regexp_count(col("text"), lit("[a-z]+")).cast("long")
            .as("n_alpha"),
          length(col("text")).cast("long").as("n_chars"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_words").as("words"),
          sum("n_alpha").as("alpha_tokens"),
          sum("n_chars").as("chars"))
        .select(col("lang"), col("n_docs"), col("words"),
          col("alpha_tokens"),
          (col("alpha_tokens").cast("double") / col("words"))
            .as("fertility"),
          (col("chars").cast("double") / col("alpha_tokens"))
            .as("chars_per_token"))
        .orderBy("lang")),

    // Uniform rebalance plan: sampling rate per language to reach an
    // equal share, in exact parts-per-million integers (rate_ppm =
    // min(10⁶, target·10⁶ div n_docs)) with the expected kept count —
    // auditable integer arithmetic end to end, like q_budget_alloc.
    "q_sampling_plan" -> ((s, dir) => {
      val byLang = t(s, dir, "documents")
        .groupBy("lang").agg(count(lit(1)).as("n_docs"))
      val tot = byLang.agg(sum("n_docs").as("n_total"),
        count(lit(1)).as("n_langs"))
      byLang.crossJoin(broadcast(tot))
        .withColumn("target",
          call_function("div", col("n_total"), col("n_langs")))
        .withColumn("rate_ppm",
          least(lit(1000000L), call_function("div",
            col("target") * 1000000L, col("n_docs"))))
        .withColumn("expected_kept",
          call_function("div", col("n_docs") * col("rate_ppm"),
            lit(1000000L)))
        .select("lang", "n_docs", "target", "rate_ppm", "expected_kept")
        .orderBy("lang")
    }),

    // Label propagation accuracy: each probe vector's label predicted
    // by 5-NN majority vote (ties: most votes, then smallest label —
    // a total order with no struct-compare corners), scored against
    // the probe's own label. Composes similarity_knn_join, so the
    // eval rides the same broadcast-probe + codegen-dot plan.
    "q_knn_label_eval" -> ((s, dir) => {
      val knn = PipelineQueries.queries("similarity_knn_join")(s, dir)
        .select("probe_id", "neighbor_id")
      val lab = t(s, dir, "embeddings")
        .select(col("vec_id"), col("label"))
      val votes = knn
        .join(lab, col("neighbor_id") === col("vec_id"))
        .groupBy(col("probe_id"), col("label").as("cand"))
        .agg(count(lit(1)).as("cnt"))
      val best = votes.groupBy("probe_id").agg(max("cnt").as("max_cnt"))
      val pick = votes.join(best, "probe_id")
        .filter(col("cnt") === col("max_cnt"))
        .groupBy("probe_id").agg(min("cand").as("pred_label"))
      pick.join(lab, col("probe_id") === col("vec_id"))
        .agg(count(lit(1)).as("n_probes"),
          sum(when(col("pred_label") === col("label"), 1L).otherwise(0L))
            .as("n_correct"))
        .select(col("n_probes"), col("n_correct"),
          try_divide(col("n_correct").cast("double"), col("n_probes"))
            .as("accuracy"))
    }))

  val oracle: Map[String, String] = Map(

    "q_dedup_pair_recall" -> {
      val pairsSql = PipelineQueries.oracle("dedup_minhash_pairs")
      s"""WITH pred AS (
         |  SELECT a_id, b_id FROM ($pairsSql)
         |  WHERE a_id < 300 AND b_id < 300
         |), ${PipelineQueries.shinglesCte},
         |shs AS (SELECT doc_id, s FROM sh WHERE doc_id < 300),
         |truth AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM shs a JOIN shs b ON a.doc_id < b.doc_id
         |  WHERE 3 * len(list_intersect(a.s, b.s)) >= len(a.s) + len(b.s)
         |), nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth),
         |np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pred FROM pred),
         |nh AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_hit
         |  FROM truth t WHERE EXISTS (
         |    SELECT 1 FROM pred p
         |    WHERE p.a_id = t.a_id AND p.b_id = t.b_id)
         |)
         |SELECT nt.n_truth, np.n_pred, nh.n_hit,
         |  CASE WHEN nt.n_truth = 0 THEN NULL
         |    ELSE CAST(nh.n_hit AS DOUBLE) / nt.n_truth END AS recall,
         |  CASE WHEN np.n_pred = 0 THEN NULL
         |    ELSE CAST(nh.n_hit AS DOUBLE) / np.n_pred END AS precision
         |FROM nt, np, nh""".stripMargin
    },

    "q_tokenizer_fertility" ->
      """WITH d AS (
        |  SELECT lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |    CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT)
        |      AS n_alpha,
        |    CAST(length(text) AS BIGINT) AS n_chars
        |  FROM documents
        |), a AS (
        |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(n_words) AS BIGINT) AS words,
        |    CAST(SUM(n_alpha) AS BIGINT) AS alpha_tokens,
        |    CAST(SUM(n_chars) AS BIGINT) AS chars
        |  FROM d GROUP BY 1
        |)
        |SELECT lang, n_docs, words, alpha_tokens,
        |  CAST(alpha_tokens AS DOUBLE) / words AS fertility,
        |  CAST(chars AS DOUBLE) / alpha_tokens AS chars_per_token
        |FROM a ORDER BY lang""".stripMargin,

    "q_sampling_plan" ->
      """WITH bl AS (
        |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY 1
        |), tot AS (
        |  SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total,
        |    CAST(COUNT(*) AS BIGINT) AS n_langs
        |  FROM bl
        |)
        |SELECT bl.lang, bl.n_docs,
        |  tot.n_total // tot.n_langs AS target,
        |  LEAST(1000000, (tot.n_total // tot.n_langs) * 1000000
        |    // bl.n_docs) AS rate_ppm,
        |  bl.n_docs * LEAST(1000000, (tot.n_total // tot.n_langs)
        |    * 1000000 // bl.n_docs) // 1000000 AS expected_kept
        |FROM bl, tot ORDER BY bl.lang""".stripMargin,

    "q_knn_label_eval" -> {
      val knnSql = PipelineQueries.oracle("similarity_knn_join")
      s"""WITH knn AS (
         |  SELECT probe_id, neighbor_id FROM ($knnSql)
         |), votes AS (
         |  SELECT k.probe_id, e.label AS cand,
         |    CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM knn k JOIN embeddings e ON k.neighbor_id = e.vec_id
         |  GROUP BY 1, 2
         |), best AS (
         |  SELECT probe_id, MAX(cnt) AS max_cnt FROM votes GROUP BY 1
         |), pick AS (
         |  SELECT v.probe_id, MIN(v.cand) AS pred_label
         |  FROM votes v JOIN best b ON v.probe_id = b.probe_id
         |    AND v.cnt = b.max_cnt
         |  GROUP BY 1
         |)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
         |  CAST(SUM(CASE WHEN p.pred_label = e.label THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_correct,
         |  CAST(CAST(SUM(CASE WHEN p.pred_label = e.label THEN 1
         |    ELSE 0 END) AS BIGINT) AS DOUBLE) / COUNT(*) AS accuracy
         |FROM pick p JOIN embeddings e ON p.probe_id = e.vec_id"""
        .stripMargin
    })
}
