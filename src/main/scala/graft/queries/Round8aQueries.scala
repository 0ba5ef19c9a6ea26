package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 first batch: the two depth asks from the r7 verdict.
  *
  *  - bpe_train_loop: a k-iteration BPE tokenizer-training loop (k=5)
  *    over the word-frequency dict — per-iteration pair counts, argmax
  *    merge with deterministic tie-breaks, corpus-wide merge
  *    application. The real tokenizer-training shape (bpe_merge_step
  *    ran ONE iteration; bpe_apply applied a precomputed top-3).
  *  - bpe_compression_curve: tokens-per-corpus after each of the k
  *    merges — the compression-vs-vocab-size curve a tokenizer budget
  *    decision reads.
  *  - dedup_cc_star: connected components over the near-dup pair graph
  *    via alternating large-star/small-star contraction (Kiveris et
  *    al., "Connected Components in MapReduce and Beyond", SoCC'14) —
  *    the O(log n)-round alternative to dedup_cc_labels' min-label
  *    propagation, with bounded skew on hub clusters.
  *
  * BPE representation: a tokenized word is a single string with token
  * boundaries marked by a double separator and flanked by one more on
  * each side — "ab" tokenized as chars is `||a||b||`. Applying merge
  * (l, r) is then ONE literal string replace of `|l||r|` with `|lr|`:
  * both Spark's and DuckDB's replace scan left-to-right non-overlapping,
  * which is exactly BPE's greedy within-iteration application ("aaa"
  * with merge (a,a) -> ["aa","a"]), and the consumed flanking bar
  * cannot suppress a legitimate adjacent match because interior
  * boundaries are TWO bars ("abab" with merge (a,b) -> ["ab","ab"]).
  * The bar is safe: document text is lowercase letters + spaces only
  * (probed in DuckDB). No arrays move between iterations — each step
  * is a vocab-sized string transform.
  *
  * Scale: the corpus-sized work is the ONE initial word-count shuffle;
  * every iteration after that runs on the word-frequency dict (vocab-
  * sized, ~100k rows even at 100 TB), with the argmax merge broadcast
  * back — the classic distributed-BPE decomposition. k=5 bounded
  * retained frames, all tiny.
  */
object Round8aQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = {
    graft.expressions.VectorExpressions.register(s)
    graft.expressions.TextExpressions.register(s)
    graft.Tables(s, dir, n)
  }

  private val S = "|"
  private val S2 = "||"

  /** Token list from the boundary-marked string form. */
  private[queries] def toks(c: Column): Column =
    filter(split(c, "\\|\\|"), x => x =!= "")

  /** Boundary-marked character tokenization of a word column. */
  private[queries] def charToks(w: Column): Column =
    concat(lit(S2), regexp_replace(w, "(.)", "$1" + S2))

  /** Word-frequency dict in string form: the classic BPE training input.
    * One corpus explode + combine-aggregated count; everything after is
    * vocab-sized. The original word rides along so trained token counts
    * can join back to any per-document / per-language breakdown.
    */
  private[queries] def bpeVocab0(words: DataFrame): DataFrame =
    words
      .filter(length(col("w")) >= 1)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("w"), charToks(col("w")).as("s"), col("freq"))

  private[queries] def docWords(s: SparkSession, dir: String): DataFrame =
    PipelineQueries.spread(s, t(s, dir, "documents"))
      .select(explode(split(col("text"), " ")).as("w"))

  /** One BPE training iteration: (argmax-merge 1-row frame (l,r,cnt),
    * next vocab with the merge applied). The argmax is a combine-
    * aggregated (pair, weighted count) shuffle + TakeOrdered(1) with a
    * total tie-break (count desc, then pair text) — deterministic at any
    * parallelism; the winning pair broadcasts back over the vocab. No
    * driver-side collect anywhere: the merge table is assembled as a
    * union of the k one-row frames. Columns other than `s` pass through
    * the merge application untouched.
    */
  private[queries] def bpeStep(cur: DataFrame): (DataFrame, DataFrame) = {
    val pairs = cur.select(col("freq"), toks(col("s")).as("tk"))
      // guard: sequence(1, 0) is DESCENDING [1,0] in Spark, so
      // single-token words must not reach the transform
      .filter(size(col("tk")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(1, size(tk) - 1), " +
          "k -> struct(element_at(tk, k) AS l, element_at(tk, k + 1) AS r))"))
        .as("p"))
    val top = pairs
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum("freq").cast("long").as("cnt"))
      .orderBy(col("cnt").desc, col("l"), col("r")).limit(1)
      .transform(graft.CacheScope.retain)
    val others = cur.columns.filterNot(_ == "s").map(col)
    val next = cur.crossJoin(broadcast(top.select("l", "r")))
      .select(replace(col("s"),
          concat(lit(S), col("l"), lit(S2), col("r"), lit(S)),
          concat(lit(S), col("l"), col("r"), lit(S))).as("s") +: others: _*)
    (top, next)
  }

  /** Train k merges; returns (merge frames 1..k, final vocab dict). */
  private[queries] def bpeTrain(vocab0: DataFrame, k: Int)
      : (Seq[DataFrame], DataFrame) = {
    var cur = vocab0.transform(graft.CacheScope.retain)
    val merges = (1 to k).map { i =>
      val (top, next) = bpeStep(cur)
      cur = next.transform(graft.CacheScope.retain)
      top.withColumn("iter", lit(i))
    }
    (merges, cur)
  }

  private[queries] val BpeK = 5

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // k-iteration BPE training: the merge table (iter, left, right,
    // merged, weighted pair count) after k=5 rounds of count-argmax-
    // apply. Each iteration: one vocab-sized combine shuffle + a 1-row
    // broadcast — at 100 TB the corpus is touched exactly once (the
    // initial word count).
    "bpe_train_loop" -> ((s, dir) => {
      val (merges, _) = bpeTrain(bpeVocab0(docWords(s, dir)), BpeK)
      merges.reduce(_ unionAll _)
        .select(col("iter"),
          col("l").as("merge_left"), col("r").as("merge_right"),
          concat(col("l"), col("r")).as("merged"),
          col("cnt").as("pair_count"))
        .orderBy("iter")
    }),

    // Tokens-in-corpus after each merge (iteration 0 = character
    // tokens): the compression curve that justifies — or caps — the
    // merge budget. Same loop; per-iteration total is a one-row
    // aggregate of freq x token-count over the vocab dict.
    "bpe_compression_curve" -> ((s, dir) => {
      var cur = bpeVocab0(docWords(s, dir)).transform(graft.CacheScope.retain)
      val counts = (0 to BpeK).map { i =>
        if (i > 0) {
          val (_, next) = bpeStep(cur)
          cur = next.transform(graft.CacheScope.retain)
        }
        cur.agg(sum(col("freq") * size(toks(col("s"))))
            .cast("long").as("n_tokens"))
          .select(lit(i).as("iter"), col("n_tokens"))
      }
      counts.reduce(_ unionAll _).orderBy("iter")
    }),

    // Connected components by alternating large-star / small-star
    // contraction over the SAME near-dup edge set as dedup_cc_labels
    // (LSH candidates confirmed at Jaccard >= 0.5), fixed point checked
    // against the same recursive-CTE oracle. Why it exists alongside
    // min-label propagation: label propagation moves the min ONE hop
    // (plus a pointer jump) per superstep, so a chain-shaped cluster
    // needs ~log(diameter) rounds AFTER the halving and every round
    // shuffles the full label table (|V| rows). Star contraction
    // shuffles only the EDGE list (|E| rows, edges << docs in a dedup
    // graph), halves path lengths on both odd and even nodes each
    // round, and its hub skew is bounded: large-star hangs every
    // neighbor strictly larger than u onto u's min — a hub's adjacency
    // is processed as ONE grouped reduction, never a pairwise product.
    // On the sf0.1 pair graph (8 clusters, diameter <= 3) both
    // converge in 2 rounds; the separation shows on deep chains, where
    // label propagation's per-round cost is |V| and this one's is |E|.
    "dedup_cc_star" -> ((s, dir) => {
      // near-dup edges: identical construction to dedup_cc_labels
      val docs = PipelineQueries.spread(s, t(s, dir, "documents"))
        .withColumn("sh", call_function("graft_shingles", col("text")))
      val bands = docs
        .select(col("doc_id"),
          posexplode(call_function("graft_minhash_bands", col("sh")))
            .as(Seq("band_idx", "band_key")))
      val cand = bands.as("a").join(bands.as("b"),
          col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .distinct()
      val sa = docs.select(col("doc_id").as("a_id"), col("sh").as("sh_a"))
      val sb = docs.select(col("doc_id").as("b_id"), col("sh").as("sh_b"))
      val inter = call_function("graft_array_intersect_size",
        col("sh_a"), col("sh_b"))
      // canonical undirected edges, u < v
      var e = sa.join(broadcast(cand), "a_id").join(sb, "b_id")
        .withColumn("inter", inter)
        .filter(col("inter") / (size(col("sh_a")) + size(col("sh_b"))
          - col("inter")) >= 0.5)
        .select(least(col("a_id"), col("b_id")).as("u"),
          greatest(col("a_id"), col("b_id")).as("v"))
        .distinct()
        .transform(graft.CacheScope.retain)
      // edge-set signature: count + order-insensitive xxhash64 sum
      // (replaced the r8 symmetric-difference job, r8 verdict #6). Both
      // sides are distinct canonical (u,v) sets, so equal (count,
      // hash-sum) means equal sets up to a 2^-64-ish collision — and
      // the exact intersect count in the same job closes even that.
      // hash-sum as decimal(38,0): a long sum of 64-bit hashes overflows
      // after a handful of rows under ANSI; 38 digits absorb 1e12 rows
      // of max-magnitude hashes with headroom
      // r12 (guide §1.2 / §5 driver): the contraction loop runs on a
      // ~250-edge frame, so its cost was ACTIONS, not data — sig(e0),
      // one sig per round, plus the final intersect confirmation were
      // 4-5 sequential jobs whose fixed stage-scheduling latency
      // dominated (pass wall 3.6 s against 1.5 s of total task time).
      // Each round now runs exactly ONE job: a union'd aggregate
      // returning the round's signature, the exact next∩e count, and
      // (first round only) the initial edge set's signature. Collecting
      // this ≤3-row frame is convergence scalars, not a data-path
      // collect. The hash is compared as its canonical string — only
      // ever against values produced by the same cast, so the equality
      // semantics are unchanged.
      def sigAgg(df: org.apache.spark.sql.DataFrame, tag: Int)
          : org.apache.spark.sql.DataFrame =
        df.agg(count(lit(1)).as("n"),
          coalesce(sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)")),
            lit(0).cast("decimal(38,0)")).as("h"))
          .select(lit(tag).as("t"), col("n"),
            col("h").cast("string").as("h"))
      var eSig: Option[(Long, String)] = None // filled by round 1's job
      var converged = false
      var iter = 0
      while (!converged && iter < 20) {
        // large-star: per node, hang every strictly-larger neighbor on
        // the node's min (min over neighbors and itself). One grouped
        // min + one join of the bidirectional edge list — a hub's whole
        // adjacency is a single reduction key.
        val bidir = e.select(col("u"), col("v"))
          .union(e.select(col("v").as("u"), col("u").as("v")))
        val mins = bidir.groupBy("u")
          .agg(least(min(col("v")), col("u")).as("m"))
        val eL = bidir.join(mins, "u")
          .filter(col("v") > col("u"))
          .select(col("m").as("u"), col("v")) // m < u < v: canonical
          .distinct()
        // small-star: orient edges large -> small, hang each node and
        // its smaller neighbors on the min of that neighborhood
        val oriented = eL.select(col("v").as("u"), col("u").as("v")) // v < u
        val sMins = oriented.groupBy("u").agg(min(col("v")).as("m"))
        // localCheckpoint, not retain (r12, guide §5 lineage / §3.3
        // planning cost): each round's logical plan otherwise CONTAINS
        // every earlier round's plan plus the whole LSH pair-graph
        // derivation, and CacheManager canonicalizes that growing tree
        // at every subtree of every action — measured as a 2.75 s
        // zero-jobs-running driver gap between round 1 and round 2
        // (vs 0.6 s of actual job time). The checkpoint truncates the
        // round frame (~250 edges) to a LogicalRDD leaf; eager, so the
        // contraction chain runs ONCE instead of once per branch of the
        // round's union'd aggregate (measured: 3.4 s lazy vs 3.0 s
        // eager vs 4.4 s retained, warm pass). e0's retain stays — the
        // expensive pair graph is what cache reuse is for.
        val next = oriented.join(sMins, "u")
          .filter(col("v") =!= col("m"))
          .select(col("m").as("u"), col("v"))
          .union(oriented.join(sMins, "u")
            .select(col("m").as("u"), col("u").as("v")))
          .distinct()
          .localCheckpoint(true)
        // converged when the canonical edge set is unchanged: the
        // signature + the EXACT set-equality count (r9 ADVICE: equal
        // (count, hash-sum) alone admits a ~2^-64 collision; both sides
        // are distinct canonical (u,v) sets with equal counts, so
        // |A ∩ B| = |A| proves A = B) — both from the round's single
        // union'd job. The intersect count is only CONSULTED when the
        // signatures match, exactly as before.
        val interAgg = next.select("u", "v").intersect(e.select("u", "v"))
          .agg(count(lit(1)).as("n"))
          .select(lit(1).as("t"), col("n"), lit(null).cast("string").as("h"))
        val roundFrame = sigAgg(next, 0).unionAll(interAgg)
        val rows = (if (eSig.isEmpty) roundFrame.unionAll(sigAgg(e, 2))
                    else roundFrame).collect()
        val byTag = rows.map(r => r.getInt(0) -> r).toMap
        val nextSig = (byTag(0).getLong(1), byTag(0).getString(2))
        val interCnt = byTag(1).getLong(1)
        if (eSig.isEmpty)
          eSig = Some((byTag(2).getLong(1), byTag(2).getString(2)))
        iter += 1
        System.err.println(
          s"[dedup_cc_star] round $iter: ${nextSig._1} edges " +
            s"(prev ${eSig.get._1})")
        converged = nextSig == eSig.get &&
          (nextSig._1 == 0L || interCnt == nextSig._1)
        eSig = Some(nextSig)
        e = next
      }
      // converged: every edge is (component-min, member). min-agg on the
      // child side is a no-op at the fixed point but keeps the answer
      // correct even if the 20-round cap ever bites.
      val stars = e.groupBy(col("v").as("doc_id")).agg(min(col("u")).as("root"))
      t(s, dir, "documents").select(col("doc_id"))
        .join(stars, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("root"), col("doc_id")).as("cluster_id"))
        .withColumn("is_dup",
          (col("doc_id") =!= col("cluster_id")).cast("int"))
        .orderBy("doc_id")
    }),
  )

  /** Unrolled BPE CTE chain for the DuckDB oracles (k triplets: pair
    * counts -> argmax -> replace-applied vocab). `prefix` namespaces the
    * CTEs so two independently-trained chains (e.g. corpus halves) can
    * coexist in one statement; `wordsSrc` is the SQL producing the word
    * stream (column `w`). The original word rides through every w_i so
    * trained token counts can join back to any breakdown.
    */
  private[queries] def bpeOracleCtes(prefix: String, wordsSrc: String,
                                     k: Int = BpeK): String = {
    def iterCtes(i: Int): String = {
      val prev = s"${prefix}w${i - 1}"
      s"""${prefix}p$i AS (
         |  SELECT p.l AS l, p.r AS r, CAST(SUM(freq) AS BIGINT) AS cnt
         |  FROM (
         |    SELECT freq, unnest([struct_pack(l := tk[k], r := tk[k+1])
         |      for k in range(1, len(tk))]) AS p
         |    FROM (SELECT freq, list_filter(str_split(s, '||'),
         |                 x -> x <> '') AS tk
         |          FROM $prev)
         |  ) GROUP BY 1, 2
         |),
         |${prefix}m$i AS (
         |  SELECT l, r, cnt FROM ${prefix}p$i
         |  ORDER BY cnt DESC, l, r LIMIT 1),
         |${prefix}w$i AS (
         |  SELECT w, replace(s, '|' || m.l || '||' || m.r || '|',
         |                 '|' || m.l || m.r || '|') AS s, freq
         |  FROM $prev CROSS JOIN ${prefix}m$i m
         |)""".stripMargin
    }
    s"""${prefix}w0 AS (
       |  SELECT w, '||' || regexp_replace(w, '(.)', '\\1||', 'g') AS s,
       |         COUNT(*) AS freq
       |  FROM ($wordsSrc)
       |  WHERE len(w) >= 1
       |  GROUP BY 1, 2
       |),
       |""".stripMargin + (1 to k).map(iterCtes).mkString(",\n")
  }

  private[queries] val AllWordsSrc =
    "SELECT unnest(string_split(text, ' ')) AS w FROM documents"

  /** DuckDB oracles. The star-contraction CC shares dedup_cc_labels'
    * recursive-CTE closure — same fixed point by construction.
    */
  val oracle: Map[String, String] = {
    val base = "WITH " + bpeOracleCtes("", AllWordsSrc)
    val mergeArms = (1 to BpeK).map(i =>
      s"""SELECT $i AS iter, l AS merge_left, r AS merge_right,
         |  l || r AS merged, cnt AS pair_count FROM m$i""".stripMargin)
      .mkString("\nUNION ALL\n")
    val curveArms = (0 to BpeK).map(i =>
      s"""SELECT $i AS iter,
         |  CAST(SUM(freq * len(list_filter(str_split(s, '||'),
         |    x -> x <> ''))) AS BIGINT) AS n_tokens FROM w$i""".stripMargin)
      .mkString("\nUNION ALL\n")
    Map(
      "bpe_train_loop" ->
        (base + "\nSELECT * FROM (\n" + mergeArms + "\n) ORDER BY iter"),
      "bpe_compression_curve" ->
        (base + "\nSELECT * FROM (\n" + curveArms + "\n) ORDER BY iter"),
      // identical fixed point, identical output schema
      "dedup_cc_star" -> Pipeline2Queries.oracle("dedup_cc_labels"),
    )
  }
}
