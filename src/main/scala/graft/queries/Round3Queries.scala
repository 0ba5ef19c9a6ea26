package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.functions.VectorFunctions._

/** Round-3 additions: the remaining classic TPC-H query shapes
  * (Q4/Q12/Q14/Q16/Q19/Q22 — EXISTS aggregation, case-sum over a join,
  * single-row ratio, distinct-count with NOT IN, disjunctive join
  * predicates, anti-join + scalar subquery), plus training-pipeline
  * continuations: an embedding-cosine dedup DROP LIST (the consumable
  * form of near-dup detection), overlapping token-window chunking,
  * per-language stratified sampling, char-n-gram language profiles, a
  * deterministic frame-sampling plan for multimodal media, and the
  * regexp-extraction surface.
  *
  * Scale posture: every join is either broadcast (dims) or blocked (LSH
  * sign buckets); chunking/sampling/profiling are single-scan + explode
  * with no driver collection; all thresholds are integer or
  * exact-decimal arithmetic so the DuckDB oracle matches bitwise.
  */
object Round3Queries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = {
    graft.expressions.VectorExpressions.register(s)
    graft.expressions.TextExpressions.register(s)
    Tables(s, dir, n)
  }

  /** Exact sum of a 2-decimal double column, surfaced as DOUBLE. */
  private def dsum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  private val dec = DecimalType(18, 2)

  /** l_extendedprice * (1 - l_discount) in exact decimals. */
  private def discPrice: Column =
    col("l_extendedprice").cast(dec) *
      (lit(1).cast(dec) - col("l_discount").cast(dec))

  private val lshDims = Seq(1, 17, 33, 49) // same probe dims as PipelineQueries

  // chunking parameters: 20-token windows, stride 15 (5-token overlap)
  private val chunkW = 20
  private val chunkS = 15

  // single trailing digit of c_name: 10 cohorts, so the qualifying set
  // stays non-empty even at sf0.001 (two-digit codes left zero rows)
  private val q22Codes = Seq("1", "2", "3", "4", "5")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TPC-H Q4 shape: orders with at least one late-shipped line item,
    // counted per priority. The EXISTS is a semi join — lineitem never
    // leaves its shuffle partition and duplicates never inflate counts.
    "q_tpch_q4" -> ((s, dir) =>
      t(s, dir, "orders")
        .join(t(s, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")),

    // TPC-H Q12 shape: high/low-priority line counts per return flag
    // (l_returnflag stands in for l_shipmode, which the synthetic
    // lineitem lacks) — the two-way conditional-sum-over-join pattern.
    "q_tpch_q12" -> ((s, dir) => {
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      t(s, dir, "orders").join(t(s, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") >= col("o_orderdate"))
        .groupBy("l_returnflag")
        .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
        .orderBy("l_returnflag")
    }),

    // TPC-H Q14 shape: promo revenue share — a single-row ratio of two
    // exact decimal sums over a broadcast part join. The division is the
    // only FP op and runs once, identically, in both engines.
    "q_tpch_q14" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")),
          col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", discPrice)
            .otherwise(lit(0).cast(dec))).cast("double").as("promo_rev"),
          sum(discPrice).cast("double").as("total_rev"))
        .select(col("promo_rev"), col("total_rev"),
          (col("promo_rev") * 100 / col("total_rev")).as("promo_pct"))),

    // TPC-H Q16 shape: distinct suppliers per (brand, size) for selected
    // sizes, excluding one brand and low-balance suppliers (NOT IN ->
    // null-safe anti join; keys are non-null so it stays a plain anti).
    "q_tpch_q16" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "supplier")
            .filter(col("s_acctbal") < 2000)
            .select(col("s_suppkey"))),
          col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(broadcast(t(s, dir, "part")
            .filter(col("p_brand") =!= "Brand#3" &&
              col("p_size").isin(1, 4, 7, 10, 13))),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))),

    // TPC-H Q19 shape: disjunctive brand/size/quantity bands INSIDE the
    // join condition — the OR must not force a cartesian; part stays
    // broadcast and each lineitem row probes once.
    "q_tpch_q19" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")),
          col("l_partkey") === col("p_partkey") && (
            (col("p_brand") === "Brand#1" && col("p_size").between(1, 5) &&
              col("l_quantity").between(1, 11)) ||
            (col("p_brand") === "Brand#2" && col("p_size").between(1, 10) &&
              col("l_quantity").between(10, 20)) ||
            (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
              col("l_quantity").between(20, 30))))
        .agg(dsum(col("l_extendedprice")).as("revenue"),
          count(lit(1)).as("n_items"))),

    // TPC-H Q22 shape: "country code" (trailing digit of the customer
    // name) cohorts with above-average balance and no pending order —
    // scalar aggregate subquery (broadcast single row) + anti join.
    "q_tpch_q22" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
        .withColumn("cntrycode", substring(col("c_name"), 18, 1))
        .filter(col("cntrycode").isin(q22Codes: _*))
      val avgBal = cust.filter(col("c_acctbal") > 0.0)
        .agg((sum(col("c_acctbal").cast(dec)).cast("double") /
          count(lit(1))).as("avgbal"))
      cust.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avgbal"))
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "P"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(count(lit(1)).as("numcust"),
          dsum(col("c_acctbal")).as("totacctbal"))
        .orderBy("cntrycode")
    }),

    // Embedding-cosine near-dup DROP LIST: the consumable dedup artifact
    // (dup -> keeper) rather than a pair list. Pairs come only from
    // sign-LSH buckets (16-way blocking — the join that survives 100x);
    // each duplicate keeps its smallest-id neighbor above the threshold.
    "dedup_embedding_cosine" -> ((s, dir) => {
      val n = t(s, dir, "embeddings")
        .withColumn("nrm", normD(col("embedding")))
        .withColumn("bucket", signBucket(col("embedding"), lshDims))
      val a = n.select(col("bucket"), col("vec_id").as("a_id"),
        col("embedding").as("ea"), col("nrm").as("na"))
      val b = n.select(col("bucket").as("bucket_b"),
        col("vec_id").as("b_id"), col("embedding").as("eb"),
        col("nrm").as("nb"))
      a.join(b, col("bucket") === col("bucket_b") &&
          col("a_id") < col("b_id"))
        .withColumn("sim",
          dotD(col("ea"), col("eb")) / (col("na") * col("nb")))
        .transform(PipelineQueries.fencedFilter(_, col("sim") >= 0.3))
        .groupBy(col("b_id").as("dup_id"))
        .agg(min(col("a_id")).as("keep_id"),
          max(col("sim")).as("best_sim"),
          count(lit(1)).as("n_neighbors"))
        .orderBy("dup_id")
    }),

    // Overlapping token-window chunking (context-window prep): W=20
    // tokens, stride 15. Pure integer arithmetic + sequence explode —
    // one scan, no shuffle until the output sort.
    "doc_chunking" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .withColumn("n", size(col("toks")))
        .withColumn("n_chunks",
          when(col("n") <= chunkW, lit(1))
            .otherwise(expr(s"((n - ${chunkW - chunkS + 1}) div $chunkS) + 1")))
        .select(col("doc_id"), col("n"), col("toks"),
          posexplode(sequence(lit(0), col("n_chunks") - 1))
            .as(Seq("chunk_idx", "ci")))
        .select(col("doc_id"), col("chunk_idx"),
          (col("chunk_idx") * chunkS).as("start_tok"),
          least(lit(chunkW), col("n") - col("chunk_idx") * chunkS)
            .as("len_tok"),
          element_at(col("toks"), col("chunk_idx") * chunkS + 1)
            .as("first_tok"))
        .orderBy("doc_id", "chunk_idx")),

    // Per-language stratified 10% sample: deterministic md5 ranking
    // inside each stratum, ceil(n/10) kept — no RNG state, identical on
    // every engine and every rerun.
    "sample_stratified" -> ((s, dir) => {
      val byLang = Window.partitionBy("lang")
      t(s, dir, "documents")
        .withColumn("h",
          md5(concat(lit("strat:"), col("doc_id").cast("string"))))
        .withColumn("rn",
          row_number().over(byLang.orderBy(col("h"), col("doc_id"))))
        .withColumn("n", count(lit(1)).over(byLang))
        .filter(col("rn") * 10 <= col("n") + 9)
        .select("lang", "doc_id", "h", "rn")
        .orderBy("lang", "rn")
    }),

    // Character-3-gram profile: top-5 grams per language over the first
    // 100 chars of each doc — the support table a real n-gram language
    // identifier trains from (lang_id uses fixed marker words).
    "ngram_profile" -> ((s, dir) =>
      PipelineQueries.spread(s, t(s, dir, "documents"))
        .select(col("lang"), substring(col("text"), 1, 100).as("sp"))
        .withColumn("len", length(col("sp")))
        .select(col("lang"), explode(
          when(col("len") < 3, array().cast("array<string>"))
            .otherwise(transform(sequence(lit(1), col("len") - 2),
              i => col("sp").substr(i, lit(3))))).as("gram"))
        .groupBy("lang", "gram")
        .agg(count(lit(1)).as("n"))
        .withColumn("rnk", row_number().over(Window.partitionBy("lang")
          .orderBy(col("n").desc, col("gram"))))
        .filter(col("rnk") <= 5)
        .select("lang", "rnk", "gram", "n")
        .orderBy("lang", "rnk")),

    // Deterministic frame-sampling plan for multimodal media: every
    // 40 ms up to 16 frames per clip (n_chars*10 stands in for the
    // clip's duration_ms — the real decoder is the stubbed mapInPandas
    // seam in MultimodalOps; this is the plan it consumes).
    "multimodal_frame_sample" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), (col("n_chars") * 10).as("duration_ms"))
        .withColumn("n_frames",
          least(lit(16), expr("(duration_ms + 39) div 40")))
        .select(col("doc_id"), col("duration_ms"), col("n_frames"),
          // guard: sequence(0, -1) counts DOWN (negative step inferred),
          // so a zero-duration clip must map to an empty array, not two
          // phantom frames — mirrors the oracle's empty range(0, 0)
          posexplode(when(col("n_frames") > 0,
            sequence(lit(0L), col("n_frames") - 1))
            .otherwise(array().cast("array<bigint>")))
            .as(Seq("frame_idx", "fi")))
        .select(col("doc_id"), col("frame_idx"),
          (col("frame_idx") * 40).as("ts_ms"), col("duration_ms"))
        .orderBy("doc_id", "frame_idx")),

    // Per-group top-k via the bounded TopKAggregator (typed Aggregator
    // with a k-entry buffer): partial aggregation caps the shuffle at k
    // rows per group per map partition — unlike the window-row_number
    // formulation, which shuffles and sorts every row (the oracle IS
    // that formulation, proving equivalence).
    "q_topk_agg" -> ((s, dir) => {
      val topk = udaf(new graft.functions.TopKAggregator(3))
      t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(topk(col("o_totalprice"), col("o_orderkey")).as("top"))
        .select(col("o_custkey"),
          posexplode(col("top")).as(Seq("pos", "e")))
        .select(col("o_custkey"), (col("pos") + 1).as("rnk"),
          col("e.id").as("o_orderkey"),
          col("e.score").as("o_totalprice"))
        .orderBy("o_custkey", "rnk")
    }),

    // Ordered funnel: users reaching insert -> update_after -> delete in
    // strict event-time order (each step's min time must follow the
    // previous step). MATCH_RECOGNIZE-style sequencing as three
    // conditional-min aggregations chained by joins — each join keyed on
    // user_id, so at scale all three resolve in one co-partitioning.
    "q_funnel_steps" -> ((s, dir) => {
      val base = t(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("tu"))
      val s1 = base.filter(col("event_type") === "insert")
        .groupBy("user_id").agg(min(col("tu")).as("t1"))
      val s2 = base.filter(col("event_type") === "update_after")
        .join(s1, "user_id").filter(col("tu") > col("t1"))
        .groupBy("user_id").agg(min(col("tu")).as("t2"))
      val s3 = base.filter(col("event_type") === "delete")
        .join(s2, "user_id").filter(col("tu") > col("t2"))
        .groupBy("user_id").agg(min(col("tu")).as("t3"))
      s1.join(s2, Seq("user_id"), "left")
        .join(s3, Seq("user_id"), "left")
        .agg(count(col("t1")).as("step1_users"),
          count(col("t2")).as("step2_users"),
          count(col("t3")).as("step3_users"))
    }),

    // Cohort retention: users bucketed by first-active day, counted per
    // (cohort, day-offset) — the daily-distinct reduction happens before
    // any join, so only (user, day) pairs shuffle, never raw events.
    "q_cohort_retention" -> ((s, dir) => {
      val days = t(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val first = days.groupBy("user_id").agg(min(col("day")).as("cohort"))
      days.join(first, "user_id")
        .groupBy(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_day"),
          datediff(col("day"), col("cohort")).as("day_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_day", "day_offset")
    }),

    // Time-series gap fill: complete per-user hourly spine (sequence
    // explode between each user's first and last active hour) with
    // forward-filled values — the resample/interpolate operator. The
    // spine is generated distributed (explode after a groupBy), never
    // on the driver.
    "q_gap_fill" -> ((s, dir) => {
      val hourly = t(s, dir, "events")
        .select(col("user_id"), date_trunc("hour", col("ts")).as("h"),
          col("value"))
        .groupBy("user_id", "h")
        .agg(dsum(col("value")).as("v"), count(lit(1)).as("n"))
      val spine = hourly.groupBy("user_id")
        .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
        .select(col("user_id"),
          explode(sequence(col("h0"), col("h1"),
            expr("INTERVAL 1 HOUR"))).as("h"))
      spine.join(hourly, Seq("user_id", "h"), "left")
        .withColumn("v_filled",
          last(col("v"), ignoreNulls = true)
            .over(Window.partitionBy("user_id").orderBy("h")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("user_id"), unix_millis(col("h")).as("h_ms"),
          coalesce(col("n"), lit(0L)).as("n_events"), col("v_filled"))
        .orderBy("user_id", "h_ms")
    }),

    // Daily new users + cumulative distinct users over time — the
    // running-distinct shape (distinct reduced to first-seen day, so the
    // cumulative count is a plain running sum, no stateful distinct).
    // The running sum is two-level: within-year prefix sums under a
    // window PARTITIONED by year, plus per-year offsets combined by a
    // broadcast non-equi self-join over the handful of year rows — no
    // single-partition window anywhere, though the daily aggregate is
    // calendar-bounded (~365 rows/year) at any data scale.
    "q_running_distinct" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy("user_id")
        .agg(min(date_format(col("ts"), "yyyy-MM-dd")).as("d"))
        .groupBy("d").agg(count(lit(1)).as("new_users"))
        .withColumn("y", substring(col("d"), 1, 4))
      val yearly = daily.groupBy("y").agg(sum("new_users").as("yn"))
      val offsets = yearly.as("a")
        .join(broadcast(yearly.as("b")), col("b.y") < col("a.y"), "left")
        .groupBy(col("a.y").as("y"))
        .agg(coalesce(sum(col("b.yn")), lit(0L)).as("off"))
      val wy = Window.partitionBy("y").orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily
        .withColumn("run", sum(col("new_users")).over(wy))
        .join(broadcast(offsets), "y")
        .withColumn("cum_users", col("off") + col("run"))
        .select("d", "new_users", "cum_users")
        .orderBy("d")
    }),

    // Schema-evolution union: by-NAME alignment with a missing column
    // null-filled (allowMissingColumns) — the batch form of ingesting
    // two feed versions into one sink table.
    "q_union_by_name" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val a = li.filter(col("l_returnflag") === "A")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").as("qty"), lit("a").as("src"))
      val b = li.filter(col("l_returnflag") === "R")
        .select(col("l_linenumber"), col("l_orderkey"),
          lit("b").as("src")) // reordered + qty missing
      a.unionByName(b, allowMissingColumns = true)
        .orderBy(col("src"), col("l_orderkey"), col("l_linenumber"),
          col("qty").asc_nulls_first)
    }),

    // KMV (k-minimum-values) distinct-count sketch, k=64: unlike HLL,
    // fully deterministic — the estimate is (k-1)*2^32 / (k-th smallest
    // 32-bit hash), so the oracle can check it bitwise (the oracle IS
    // the window form, proving equivalence). The mergeable at-scale
    // form, and the plan here: distinct hashes (1 combine shuffle),
    // then a bounded 64-entry TopKAggregator buffer per group — partial
    // aggregation caps the second shuffle at 64 rows/group/partition.
    // The r4 window form (row_number over a 3-value partition key) was
    // a scale-killer: it sorted ALL distinct hashes in 3 single tasks.
    // score = -u keeps the SMALLEST hashes; exact in double since
    // u < 2^32 << 2^53, and ids (the distinct hashes) are unique per
    // group so the aggregator's order is total -> deterministic.
    "q_kmv_distinct" -> ((s, dir) => {
      val u = conv(substring(md5(col("l_partkey").cast("string")), 1, 8),
        16, 10).cast("long")
      val bottom64 = udaf(new graft.functions.TopKAggregator(64))
      val kth = element_at(col("mins"), 64).getField("id")
      t(s, dir, "lineitem")
        .select(col("l_returnflag"), u.as("u")).distinct()
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_distinct"),
          bottom64(-col("u").cast("double"), col("u")).as("mins"))
        .filter(size(col("mins")) === 64) // <64 distinct: no k-th min
        .select(col("l_returnflag"), col("n_distinct"),
          kth.as("kth_min"),
          (lit((63L * 4294967296L).toDouble) / kth).as("est_distinct"))
        .orderBy("l_returnflag")
    }),

    // ANN quality metric: recall@10 of the compressed-domain PQ search
    // against exact brute force, by composing the two existing queries —
    // the measurement a pipeline runs before trusting an index at scale.
    "ann_recall" -> ((s, dir) => {
      val exact = PipelineQueries.queries("similarity_topk")(s, dir)
        .select(col("vec_id"))
      val approx = Pipeline2Queries.queries("ann_pq_topk")(s, dir)
        .select(col("vec_id").as("pq_id"))
      exact.join(approx, col("vec_id") === col("pq_id"), "left_semi")
        .agg(count(lit(1)).as("hits"),
          (count(lit(1)) / lit(10.0)).as("recall_at_10"))
    }),

    // Grouping metadata: grouping()/grouping_id() distinguish real NULL
    // keys from subtotal rows in cube output — without them rollup
    // results are unconsumable downstream.
    "q_grouping_id" -> ((s, dir) =>
      t(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
          grouping(col("o_orderstatus")).as("g_status"),
          grouping(col("o_orderpriority")).as("g_prio"),
          grouping_id().as("gid"))
        .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)),

    // ANSI-safe arithmetic: try_divide / try_to_number give NULL
    // instead of runtime errors — the functions a pipeline needs with
    // ANSI mode on (Spark 4 default). Divisors derive from integers
    // only: a double->int cast truncates in Spark but rounds in DuckDB.
    // The try_to_number results are cast to BIGINT before comparison:
    // r3/r4 hash mismatches came from these being the ONLY DECIMAL
    // output columns in the whole suite (all cell values were bitwise
    // identical to the oracle — the driver's hash normalizes decimal
    // columns differently between the DuckDB result and the parquet
    // dump). BIGINT is the kind every other green query uses. flag_num
    // also mixes parsed digits with letter->NULL rows so no output
    // column is all-NULL.
    "q_try_funcs" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 100)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"),
          // both operands cast to double: Spark's decimal try_divide and
          // DuckDB's decimal `/` round the quotient under different scale
          // rules (r3 hash mismatch); IEEE double division is identical
          try_divide(col("l_quantity").cast("double"),
              (col("l_linenumber") % 3).cast("double"))
            .as("qty_per_bucket"), // NULL where linenumber % 3 == 0
          try_to_number(col("l_linenumber").cast("string"), lit("9"))
            .cast("long").as("lnum_parsed"),
          try_to_number(
              when(col("l_linenumber") % 2 === 0, col("l_returnflag"))
                .otherwise(col("l_linenumber").cast("string")),
              lit("9"))
            .cast("long").as("flag_num")) // letters -> NULL, digits parse
        .orderBy("l_orderkey", "l_linenumber", "l_quantity",
          "qty_per_bucket")),

    // Complex-type surface: JSON -> struct (from_json), struct field
    // access, map construction + lookup, map_keys — flattened back to
    // scalars so the oracle checks the round-tripped values.
    "q_complex_types" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .withColumn("js", from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT")))
        .withColumn("k", col("js").getField("k"))
        .withColumn("m", map(lit("k"), col("k"), lit("2k"), col("k") * 2))
      ev.select(col("event_id"), col("k"),
          element_at(col("m"), "2k").as("k_doubled"),
          size(col("m")).as("map_size"),
          array_join(array_sort(map_keys(col("m"))), ",").as("keys_csv"),
          struct(col("event_id"), col("k")).getField("k").as("k_struct"))
        .orderBy("event_id")
    }),

    // Regexp extraction surface: all vowel-initial words per doc
    // (regexp_extract_all with a capture-group index), plus derived
    // stats — the BPE-ish regex tokenization path.
    "q_regexp_funcs" -> ((s, dir) =>
      t(s, dir, "documents")
        .withColumn("vw", regexp_extract_all(col("text"),
          lit("(^| )([aeiou][a-z]*)"), lit(2)))
        .filter(size(col("vw")) > 0)
        .select(col("doc_id"), size(col("vw")).as("n_vowel_words"),
          element_at(col("vw"), 1).as("first_vw"),
          array_max(transform(col("vw"), w => length(w))).as("max_vw_len"))
        .orderBy("doc_id"))
  )

  // ---------------------------------------------------------------- oracle

  // the ONE fold definition both files' oracles must share bitwise
  private def dotSql(a: String, b: String): String =
    PipelineQueries.dotSql(a, b)
  private def normSql(a: String): String = PipelineQueries.normSql(a)

  private val discSql =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * " +
      "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"

  val oracle: Map[String, String] = Map(

    "q_tpch_q4" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q_tpch_q12" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= o_orderdate
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q_tpch_q14" ->
      s"""WITH j AS (
         |  SELECT p_type, $discSql AS dp
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |), a AS (
         |  SELECT
         |    CAST(SUM(CASE WHEN p_type = 'PROMO' THEN dp
         |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_rev,
         |    CAST(SUM(dp) AS DOUBLE) AS total_rev
         |  FROM j
         |)
         |SELECT promo_rev, total_rev,
         |  promo_rev * 100 / total_rev AS promo_pct
         |FROM a""".stripMargin,

    "q_tpch_q16" ->
      """SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#3' AND p_size IN (1, 4, 7, 10, 13)
        |  AND l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 2000)
        |GROUP BY p_brand, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin,

    "q_tpch_q19" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
        |    AND l_quantity BETWEEN 1 AND 11)
        |  OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
        |    AND l_quantity BETWEEN 10 AND 20)
        |  OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
        |    AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q_tpch_q22" -> {
      val codes = q22Codes.map(c => s"'$c'").mkString(", ")
      s"""WITH cust AS (
         |  SELECT *, substring(c_name, 18, 1) AS cntrycode FROM customer
         |  WHERE substring(c_name, 18, 1) IN ($codes)
         |), avgbal AS (
         |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
         |    / COUNT(*) AS v
         |  FROM cust WHERE c_acctbal > 0.0
         |)
         |SELECT cntrycode, COUNT(*) AS numcust,
         |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
         |    AS totacctbal
         |FROM cust, avgbal
         |WHERE c_acctbal > v AND NOT EXISTS (
         |  SELECT 1 FROM orders
         |  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
         |GROUP BY cntrycode
         |ORDER BY cntrycode""".stripMargin
    },

    "dedup_embedding_cosine" -> {
      val bucket = lshDims.zipWithIndex.map { case (d, j) =>
        s"(CASE WHEN embedding[$d] > 0 " +
          s"THEN ${1 << (lshDims.length - 1 - j)} ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH n AS (
         |  SELECT vec_id, embedding, ${normSql("embedding")} AS nrm,
         |    $bucket AS bucket
         |  FROM embeddings
         |), p AS (
         |  SELECT b.vec_id AS dup_id, a.vec_id AS a_id,
         |    ${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS sim
         |  FROM n a JOIN n b
         |    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |)
         |SELECT dup_id, MIN(a_id) AS keep_id, MAX(sim) AS best_sim,
         |  COUNT(*) AS n_neighbors
         |FROM p WHERE sim >= 0.3
         |GROUP BY dup_id
         |ORDER BY dup_id""".stripMargin
    },

    "doc_chunking" ->
      s"""WITH d AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks,
         |    len(string_split(text, ' ')) AS n
         |  FROM documents
         |), c AS (
         |  SELECT doc_id, n, toks,
         |    unnest(range(0, CASE WHEN n <= $chunkW THEN 1
         |      ELSE (n - ${chunkW - chunkS + 1}) // $chunkS + 1 END))
         |      AS chunk_idx
         |  FROM d
         |)
         |SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
         |  CAST(chunk_idx * $chunkS AS INT) AS start_tok,
         |  CAST(least($chunkW, n - chunk_idx * $chunkS) AS INT) AS len_tok,
         |  toks[CAST(chunk_idx * $chunkS + 1 AS INT)] AS first_tok
         |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,

    "sample_stratified" ->
      """WITH d AS (
        |  SELECT lang, doc_id,
        |    md5('strat:' || CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents
        |), r AS (
        |  SELECT lang, doc_id, h,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY lang) AS n
        |  FROM d
        |)
        |SELECT lang, doc_id, h, rn FROM r
        |WHERE rn * 10 <= n + 9
        |ORDER BY lang, rn""".stripMargin,

    "ngram_profile" ->
      """WITH d AS (
        |  SELECT lang, substring(text, 1, 100) AS sp FROM documents
        |), g AS (
        |  SELECT lang,
        |    unnest(list_transform(range(1, length(sp) - 1),
        |      i -> substring(sp, CAST(i AS INT), 3))) AS gram
        |  FROM d
        |), c AS (
        |  SELECT lang, gram, COUNT(*) AS n FROM g GROUP BY lang, gram
        |), r AS (
        |  SELECT lang, gram, n,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY n DESC, gram) AS rnk
        |  FROM c
        |)
        |SELECT lang, rnk, gram, n FROM r WHERE rnk <= 5
        |ORDER BY lang, rnk""".stripMargin,

    "multimodal_frame_sample" ->
      """WITH d AS (
        |  SELECT doc_id, n_chars * 10 AS duration_ms,
        |    least(16, (n_chars * 10 + 39) // 40) AS n_frames
        |  FROM documents
        |)
        |SELECT doc_id, unnest(range(0, n_frames)) AS frame_idx,
        |  unnest(range(0, n_frames)) * 40 AS ts_ms, duration_ms
        |FROM d ORDER BY doc_id, frame_idx""".stripMargin,

    "q_topk_agg" ->
      """WITH r AS (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders
        |)
        |SELECT o_custkey, rnk, o_orderkey, o_totalprice FROM r
        |WHERE rnk <= 3
        |ORDER BY o_custkey, rnk""".stripMargin,

    "q_funnel_steps" ->
      """WITH base AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS tu FROM events
        |), s1 AS (
        |  SELECT user_id, MIN(tu) AS t1 FROM base
        |  WHERE event_type = 'insert' GROUP BY user_id
        |), s2 AS (
        |  SELECT b.user_id, MIN(b.tu) AS t2
        |  FROM base b JOIN s1 USING (user_id)
        |  WHERE b.event_type = 'update_after' AND b.tu > s1.t1
        |  GROUP BY b.user_id
        |), s3 AS (
        |  SELECT b.user_id, MIN(b.tu) AS t3
        |  FROM base b JOIN s2 USING (user_id)
        |  WHERE b.event_type = 'delete' AND b.tu > s2.t2
        |  GROUP BY b.user_id
        |)
        |SELECT COUNT(s1.t1) AS step1_users, COUNT(s2.t2) AS step2_users,
        |  COUNT(s3.t3) AS step3_users
        |FROM s1 LEFT JOIN s2 USING (user_id)
        |  LEFT JOIN s3 USING (user_id)""".stripMargin,

    "q_cohort_retention" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        |), first AS (
        |  SELECT user_id, MIN(day) AS cohort FROM days GROUP BY user_id
        |)
        |SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day,
        |  date_diff('day', cohort, day) AS day_offset,
        |  COUNT(*) AS n_users
        |FROM days JOIN first USING (user_id)
        |GROUP BY cohort_day, day_offset
        |ORDER BY cohort_day, day_offset""".stripMargin,

    "q_gap_fill" ->
      """WITH hourly AS (
        |  SELECT user_id, date_trunc('hour', ts) AS h,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v,
        |    COUNT(*) AS n
        |  FROM events GROUP BY user_id, date_trunc('hour', ts)
        |), spine AS (
        |  SELECT user_id,
        |    unnest(generate_series(min(h), max(h), INTERVAL 1 HOUR)) AS h
        |  FROM hourly GROUP BY user_id
        |)
        |SELECT s.user_id, epoch_ms(s.h) AS h_ms,
        |  COALESCE(hy.n, 0) AS n_events,
        |  last_value(hy.v IGNORE NULLS) OVER (
        |    PARTITION BY s.user_id ORDER BY s.h
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
        |FROM spine s LEFT JOIN hourly hy
        |  ON s.user_id = hy.user_id AND s.h = hy.h
        |ORDER BY s.user_id, h_ms""".stripMargin,

    "q_running_distinct" ->
      """WITH f AS (
        |  SELECT user_id, min(strftime(ts, '%Y-%m-%d')) AS d
        |  FROM events GROUP BY user_id
        |), daily AS (
        |  SELECT d, COUNT(*) AS new_users FROM f GROUP BY d
        |)
        |SELECT d, new_users,
        |  CAST(SUM(new_users) OVER (ORDER BY d
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_users
        |FROM daily ORDER BY d""".stripMargin,

    "q_union_by_name" ->
      """SELECT * FROM (
        |  SELECT l_orderkey, l_linenumber, l_quantity AS qty, 'a' AS src
        |  FROM lineitem WHERE l_returnflag = 'A'
        |  UNION ALL BY NAME
        |  SELECT l_linenumber, l_orderkey, 'b' AS src
        |  FROM lineitem WHERE l_returnflag = 'R'
        |)
        |ORDER BY src, l_orderkey, l_linenumber, qty NULLS FIRST""".stripMargin,

    "q_kmv_distinct" ->
      """WITH d AS (
        |  SELECT DISTINCT l_returnflag,
        |    list_reduce([CAST(0 AS BIGINT)] || list_transform(
        |      string_split_regex(
        |        substring(md5(CAST(l_partkey AS VARCHAR)), 1, 8), ''),
        |      c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
        |      (acc, v) -> acc * 16 + v) AS u
        |  FROM lineitem
        |), r AS (
        |  SELECT l_returnflag, u,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY u) AS rn,
        |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n_distinct
        |  FROM d
        |)
        |SELECT l_returnflag, n_distinct, u AS kth_min,
        |  270582939648.0 / u AS est_distinct
        |FROM r WHERE rn = 64
        |ORDER BY l_returnflag""".stripMargin,

    "ann_recall" -> {
      val exact = PipelineQueries.oracle("similarity_topk")
      val pq = Pipeline2Queries.oracle("ann_pq_topk")
      s"""WITH exact_t AS ($exact), pq_t AS ($pq)
         |SELECT COUNT(*) AS hits, COUNT(*) / 10.0 AS recall_at_10
         |FROM exact_t WHERE vec_id IN (SELECT vec_id FROM pq_t)"""
        .stripMargin
    },

    "q_grouping_id" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  GROUPING(o_orderstatus) AS g_status,
        |  GROUPING(o_orderpriority) AS g_prio,
        |  GROUPING(o_orderstatus, o_orderpriority) AS gid
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |HAVING COUNT(*) > 0
        |ORDER BY gid, o_orderstatus NULLS FIRST,
        |  o_orderpriority NULLS FIRST""".stripMargin,

    "q_try_funcs" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  CAST(l_quantity AS DOUBLE) /
        |    CAST(NULLIF(l_linenumber % 3, 0) AS DOUBLE) AS qty_per_bucket,
        |  CAST(TRY_CAST(CAST(l_linenumber AS VARCHAR) AS DECIMAL(1,0))
        |    AS BIGINT) AS lnum_parsed,
        |  CAST(TRY_CAST(CASE WHEN l_linenumber % 2 = 0 THEN l_returnflag
        |    ELSE CAST(l_linenumber AS VARCHAR) END AS DECIMAL(1,0))
        |    AS BIGINT) AS flag_num
        |FROM lineitem WHERE l_orderkey < 100
        |ORDER BY l_orderkey, l_linenumber, l_quantity,
        |  qty_per_bucket NULLS FIRST""".stripMargin,

    "q_complex_types" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k,
        |  CAST(json_extract_string(props, '$.k') AS INT) * 2 AS k_doubled,
        |  2 AS map_size,
        |  '2k,k' AS keys_csv,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_struct
        |FROM events
        |ORDER BY event_id""".stripMargin,

    "q_regexp_funcs" ->
      """WITH v AS (
        |  SELECT doc_id,
        |    regexp_extract_all(text, '(^| )([aeiou][a-z]*)', 2) AS vw
        |  FROM documents
        |)
        |SELECT doc_id, len(vw) AS n_vowel_words, vw[1] AS first_vw,
        |  list_max(list_transform(vw, w -> length(w))) AS max_vw_len
        |FROM v WHERE len(vw) > 0
        |ORDER BY doc_id""".stripMargin
  )
}
