package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Weak-scaling measurement harness (r8 verdict #3): "measure scale
  * instead of arguing it". Synthesizes a `factor`x replica of the sf0.1
  * testdata (union of key-shifted copies, written to parquet once) and
  * times the shuffle-heaviest queries at 1x and at `factor`x, printing
  * per-query wall times and the fitted scaling exponent
  * log(t_Nx / t_1x) / log(N). An exponent near 1.0 = linear (the plan
  * survives the scale-up); near 2.0 = quadratic (a scale-killer).
  *
  * Replication model — WEAK scaling, i.e. the key domain grows with the
  * data (a 10x corpus has ~10x distinct parts/orders/users/docs, not
  * 10x rows per key): every id-like key is shifted by
  * `copy * 100_000_000` so per-key cardinalities, join fan-outs, and
  * group sizes stay constant while table sizes grow. This is what a
  * 100 TB deployment of the same schema looks like; leaving key domains
  * fixed would instead multiply per-key join outputs by factor^2 — a
  * data-semantics explosion, not a plan property. region/nation stay
  * single-copy (bounded dims, like the real world).
  *
  * `documents.text` is additionally word-permuted per copy (sort words
  * by md5(word || copy)): an identical-text replica would make every
  * row a 10-way exact/near duplicate, growing LSH candidate PAIRS
  * quadratically in the copy count — again workload inflation, not
  * plan behavior. The permutation preserves doc lengths and word
  * frequencies (so tf/idf/BPE statistics are corpus-realistic) while
  * giving copies disjoint shingle sets. `embeddings.embedding` is
  * dimension-permuted per copy for the same reason (identical replicas
  * = factor-way exact duplicate vectors): one permutation per copy
  * preserves norms and within-copy dot products exactly while
  * scrambling cross-copy similarity.
  *
  * Usage: runMain graft.ScaleStress <srcSfDir> <workDir> [factor] [q1,q2,...]
  * Output: one JSON line per query + a trailing summary line; the round
  * report (SCALE_r09.md) is written from this output by hand.
  */
object ScaleStress {

  /** The 10 shuffle-heaviest queries named by the r8 verdict, plus the
    * round-9 graph/temporal/ANN heavies named by the r9 verdict (#4).
    */
  val DefaultQueries: Seq[String] = Seq(
    "dedup_cc_star", "graph_triangles", "q_local_clustering",
    "q_trigram_lm_nll", "dedup_minhash_pairs", "term_tfidf",
    "bpe_train_loop", "q_semijoin_program", "simhash_hamming_pairs",
    "q_join_size_audit",
    "q_ktruss_support", "q_link_pred_cn", "q_ppr_seeds",
    "q_bucketed_range_join", "q_nearest_event_join", "q_asof_global",
    "ann_spann_closure")

  // > every sf0.1 key (max 149,999) by ~66x, AND small enough that
  // factor-100 replicas keep every node id under 10^9 < 2^31 — the
  // precondition of q_ktruss_support's single-long edge packing
  // (a << 32 | b). The previous 10^8 unit put 100x ids at ~10^10,
  // outside the packable range. Shifts only relabel keys; per-copy
  // structure and cross-copy disjointness (ShiftUnit > max key) are
  // unchanged, so exponents stay comparable across rounds.
  private val ShiftUnit = 10000000L

  /** Per-table id-like columns to shift per copy (weak scaling). */
  private val keyCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  private def oneCopy(base: DataFrame, table: String, i: Int): DataFrame = {
    val shifted = keyCols.getOrElse(table, Nil).foldLeft(base) { (df, k) =>
      df.withColumn(k, col(k) + lit(i * ShiftUnit))
    }
    if (table == "embeddings" && i > 0) {
      // deterministic per-copy DIMENSION permutation (r9 ADVICE: a bare
      // vec_id shift replicates IDENTICAL vectors, so any similarity/ANN
      // query would see factor-way exact duplicates — the same quadratic
      // candidate inflation the documents permutation guards against).
      // One permutation per copy, applied to every vector: norms and
      // all WITHIN-copy dot products are exactly preserved (per-copy
      // geometry, cluster structure, and recall targets unchanged),
      // while cross-copy similarity is scrambled — copies behave like
      // fresh corpus regions, which is what weak scaling means.
      shifted.withColumn("embedding", expr(
        s"transform(array_sort(transform(sequence(0, size(embedding) - 1), " +
          s"j -> struct(md5(concat(cast(j AS string), '_$i')) AS h, j AS j))), " +
          s"q -> element_at(embedding, q.j + 1))"))
    } else if (table == "documents" && i > 0) {
      // deterministic per-copy word permutation; n_chars re-derived so
      // the length/text invariant holds inside each copy. The sort key
      // MUST include the word's position (and the doc): keying on the
      // word alone canonicalizes order ACROSS docs — every doc in a
      // copy sorts shared vocabulary identically, shingle overlap
      // between unrelated docs explodes, and the first generation
      // produced 2.2M LSH candidate edges where 1x has 256.
      shifted
        .withColumn("text", expr(
          s"concat_ws(' ', transform(array_sort(transform(split(text, ' '), " +
            s"(w, p) -> struct(md5(concat(w, '_', p, '_', doc_id, '_$i')) AS h, " +
            s"w AS w))), q -> q.w))"))
        .withColumn("n_chars", length(col("text")).cast("long"))
    } else shifted
  }

  def generate(s: SparkSession, srcDir: String, dstDir: String,
               factor: Int): Unit = {
    val done = new java.io.File(s"$dstDir/_GENERATED")
    if (done.exists()) { System.err.println(s"[scale] reusing $dstDir"); return }
    for (table <- Tables.all) {
      val base = s.read.parquet(s"$srcDir/$table.parquet")
      val out =
        if (table == "region" || table == "nation") base // bounded dims
        else (0 until factor).map(oneCopy(base, table, _)).reduce(_ union _)
      out.write.mode("overwrite").parquet(s"$dstDir/$table.parquet")
      System.err.println(s"[scale] wrote $table x" +
        (if (keyCols.contains(table)) factor else 1))
    }
    done.createNewFile(); ()
  }

  private def time(s: SparkSession, name: String, dir: String): Double = {
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(s, dir).write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val srcDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val workDir = if (args.length > 1) args(1) else "/tmp/graft_scale"
    val factor = if (args.length > 2) args(2).toInt else 10
    val qs = if (args.length > 3) args(3).split(",").toSeq else DefaultQueries
    val s = GraftSession.build(
      cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      appName = "graft-scale",
      // scale-stress is the one surface where a 1-row broadcast
      // legitimately waits minutes on its child (ktruss at 100x)
      broadcastTimeout = "1800")
    val bigDir = s"$workDir/sf${factor}x"
    generate(s, srcDir, bigDir, factor)

    val rows = qs.filter(SparkEntry.queries.contains).map { name =>
      // warm pass at 1x fronts JIT so neither reading is compile-bound;
      // min of 2 timed passes per scale, small before big
      time(s, name, srcDir); s.catalog.clearCache()
      val t1 = (1 to 2).map { _ =>
        val t = time(s, name, srcDir); s.catalog.clearCache(); t
      }.min
      val tN = (1 to 2).map { _ =>
        val t = time(s, name, bigDir); s.catalog.clearCache(); t
      }.min
      val exp = math.log(tN / t1) / math.log(factor.toDouble)
      println(f"""{"query":"$name","t1x":$t1%.3f,"t${factor}x":$tN%.3f,"exponent":$exp%.3f}""")
      (name, t1, tN, exp)
    }
    val worst = rows.maxBy(_._4)
    println(f"""{"metric":"scale_worst_exponent","query":"${worst._1}","value":${worst._4}%.3f,"factor":$factor,"n_queries":${rows.size}}""")
    s.stop()
  }
}
