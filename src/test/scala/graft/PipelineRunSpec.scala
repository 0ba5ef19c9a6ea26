package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The end-to-end pipeline's ledger must RECONCILE — every document is
  * accounted for at every stage, stage k+1 consumes exactly stage k's
  * survivors, and the packing manifest covers exactly the final token
  * stream (r10 verdict #5).
  */
class PipelineRunSpec extends AnyFunSuite with SparkSuite {

  private lazy val outDir = {
    val d = java.nio.file.Files.createTempDirectory("graft_pipeline_spec")
    d.toFile.deleteOnExit()
    d.toString
  }

  private lazy val stages = PipelineRun.run(spark, sf0001, outDir)

  test("every stage accounts for every document and token") {
    assert(stages.map(_.stage) == Seq("ingest", "bench_split",
      "quality_gate", "dedup_exact", "dedup_fuzzy", "decontam",
      "token_budget", "pack", "index_write"))
    stages.foreach { s =>
      assert(s.docsKept + s.docsDropped == s.docsIn, s.stage)
      assert(s.tokensKept + s.tokensDropped == s.tokensIn, s.stage)
      assert(s.docsKept >= 0 && s.docsDropped >= 0, s.stage)
    }
  }

  test("stage k+1 consumes exactly stage k's survivors") {
    stages.sliding(2).foreach { case Seq(a, b) =>
      assert(b.docsIn == a.docsKept, s"${a.stage} -> ${b.stage}")
      assert(b.tokensIn == a.tokensKept, s"${a.stage} -> ${b.stage}")
    }
  }

  test("the token budget stage respects the 60% waterfill budget") {
    val tb = stages.find(_.stage == "token_budget").get
    assert(tb.tokensKept <= (0.6 * tb.tokensIn).toLong,
      s"kept ${tb.tokensKept} over budget of 60% x ${tb.tokensIn}")
    // greedy truncation should still land reasonably close (>= 40%)
    assert(tb.tokensKept >= (0.4 * tb.tokensIn).toLong)
  }

  test("manifest covers exactly the packed survivors, shard-contiguous") {
    val pack = stages.last
    val manifest = spark.read.parquet(s"$outDir/manifest.parquet")
    assert(manifest.count() == pack.docsKept)
    val tokSum = manifest.agg(sum("tok")).head().getLong(0)
    assert(tokSum == pack.tokensKept)
    // per shard the final pack id must equal (shard tokens - 1) div 512:
    // the concat-then-chunk stream has no holes
    val perShard = manifest.groupBy("shard")
      .agg(sum("tok").as("t"), max("pack_last").as("last"))
      .collect()
    perShard.foreach { r =>
      assert(r.getLong(2) == (r.getLong(1) - 1) / 512,
        s"shard ${r.get(0)} pack ids not contiguous")
    }
    // window sanity on every doc
    val bad = manifest.filter(col("pack_first") > col("pack_last") ||
      col("pack_first") < 0).count()
    assert(bad == 0)
  }

  // ---- incremental (day-2) mode ---------------------------------------

  private lazy val incDir = {
    val d = java.nio.file.Files.createTempDirectory("graft_pipeline_inc")
    d.toFile.deleteOnExit()
    d.toString
  }

  private lazy val incStages = PipelineRun.incremental(spark, sf0001, incDir)

  test("incremental ledger reconciles and chains") {
    assert(incStages.map(_.stage) == Seq("ingest_new", "quality_gate",
      "dedup_exact_vs_base", "dedup_exact_internal", "dedup_fuzzy_vs_base",
      "dedup_fuzzy_internal", "decontam", "pack_append"))
    incStages.foreach { s =>
      assert(s.docsKept + s.docsDropped == s.docsIn, s.stage)
      assert(s.tokensKept + s.tokensDropped == s.tokensIn, s.stage)
    }
    incStages.sliding(2).foreach { case Seq(a, b) =>
      assert(b.docsIn == a.docsKept, s"${a.stage} -> ${b.stage}")
    }
  }

  test("no incremental survivor's fingerprint exists in the base index") {
    incStages // force the run
    val manifest = spark.read
      .parquet(s"$incDir/manifest_incremental.parquet")
    val withCut = PipelineRun.corpusWithCut(spark, sf0001, 0.8)
    val baseFps = PipelineRun.fingerprintsOf(
      PipelineRun.baseSurvivorsFor(withCut))
    val survivors = withCut.join(manifest.select("doc_id"), "doc_id")
    val overlap = PipelineRun.fingerprintsOf(survivors)
      .join(baseFps, "fp").count()
    assert(overlap == 0, s"$overlap surviving fingerprints already indexed")
  }

  test("incremental packs continue per shard after the base manifest") {
    incStages
    val manifest = spark.read
      .parquet(s"$incDir/manifest_incremental.parquet")
    val perShard = manifest.groupBy("shard")
      .agg(min("pack_first").as("first"), max("pack_last").as("last"),
        sum("tok").as("t"))
      .collect()
    perShard.foreach { r =>
      val (first, last, t) =
        (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(first >= 0)
      // contiguous within the appended stream
      assert(last - first == (t - 1) / 512,
        s"shard ${r.get(0)} appended packs not contiguous")
    }
  }

  // ---- persisted day-2 state (r11 verdict #3) --------------------------

  test("the full run's persisted state matches the shipped set") {
    stages // force the run
    val manifest = spark.read.parquet(s"$outDir/manifest.parquet")
    val (fps, bands, tails) = PipelineRun.readState(spark, s"$outDir/state")
    // fingerprints: exactly the distinct fps of the manifest's docs
    val kept = Tables(spark, sf0001, "documents")
      .join(manifest.select("doc_id"), Seq("doc_id"), "left_semi")
    assert(fps.count() == PipelineRun.fingerprintsOf(kept).count())
    assert(fps.join(PipelineRun.fingerprintsOf(kept), Seq("fp"),
      "left_anti").count() == 0)
    // band table covers every shipped doc
    assert(bands.select("doc_id").distinct().count() == manifest.count())
    // pack tails equal the manifest's per-shard pack count
    val fromManifest = manifest.groupBy("shard")
      .agg(((sum("tok") + 511L).cast("long")).as("t"))
      .selectExpr("shard", "t div 512 AS m_packs")
    val diff = tails.join(fromManifest, "shard")
      .filter(col("base_packs") =!= col("m_packs")).count()
    assert(diff == 0, "persisted pack tails disagree with the manifest")
  }

  private lazy val stateDirs = {
    val st = java.nio.file.Files.createTempDirectory("graft_pipe_state")
    val out = java.nio.file.Files.createTempDirectory("graft_pipe_inc2")
    st.toFile.deleteOnExit(); out.toFile.deleteOnExit()
    (st.toString, out.toString)
  }

  /** prepare-state + incremental-with-state, run once, shared below. */
  private lazy val withStateStages = {
    val (stDir, outDir2) = stateDirs
    val (n, _) = PipelineRun.prepareState(spark, sf0001, s"$stDir/state")
    assert(n > 0)
    PipelineRun.incremental(spark, sf0001, outDir2,
      stateDir = Some(s"$stDir/state"))
  }

  test("day-1 state + day-2 run is identical to the recomputed mode") {
    incStages // force the recompute-mode run into incDir
    val (_, outDir2) = stateDirs
    // identical ledgers (stage names + doc/token flows)...
    assert(withStateStages.map(s => (s.stage, s.docsIn, s.docsKept,
      s.tokensIn, s.tokensKept)) == incStages.map(s => (s.stage, s.docsIn,
      s.docsKept, s.tokensIn, s.tokensKept)))
    // ...and bitwise-identical manifests
    val a = spark.read.parquet(s"$incDir/manifest_incremental.parquet")
    val b = spark.read.parquet(s"$outDir2/manifest_incremental.parquet")
    assert(a.count() == b.count())
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("appended pack ids strictly continue from the persisted tails") {
    withStateStages // force the with-state run
    val (stDir, outDir2) = stateDirs
    val manifest = spark.read
      .parquet(s"$outDir2/manifest_incremental.parquet")
    val (_, _, tails) = PipelineRun.readState(spark, s"$stDir/state")
    val firsts = manifest.groupBy("shard")
      .agg(min("pack_first").as("first"))
      .join(tails, Seq("shard"), "left")
      .collect()
    firsts.foreach { r =>
      val tail = if (r.isNullAt(2)) 0L else r.getLong(2)
      assert(r.getLong(1) == tail,
        s"shard ${r.get(0)} first new pack ${r.getLong(1)} != tail $tail")
    }
  }

  test("the ledger artifact matches the returned stage rows") {
    val ledger = spark.read.parquet(s"$outDir/ledger.parquet")
      .orderBy("stage").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = stages.map(s => (s.stage, s.docsIn, s.docsKept))
      .sortBy(_._1)
    assert(ledger.toSeq == expect)
  }
}
