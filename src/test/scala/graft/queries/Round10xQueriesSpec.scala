package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-10 late batches (l onward) at
  * sf0.001 — exact values ride the DuckDB oracle gate at
  * sf0.01/sf0.001; these pin the properties a hash compare can't
  * express.
  */
class Round10xQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(m: Map[String, (org.apache.spark.sql.SparkSession,
    String) => org.apache.spark.sql.DataFrame], name: String) =
    m(name)(spark, sf0001)

  // ---- 10l: item-item co-occurrence ----------------------------------

  test("q_item_cooc: top pair support matches the brute-force count") {
    val rows = run(Round10lQueries.queries, "q_item_cooc").collect()
    assert(rows.nonEmpty)
    val top = rows.head
    // brute force on the collected basket list (sf0.001 is ~6k rows)
    val b = graft.Tables(spark, sf0001, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = b.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val pairCounts = scala.collection.mutable.Map[(Long, Long), Long]()
    byOrder.values.foreach { ps =>
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        pairCounts((ps(i), ps(j))) =
          pairCounts.getOrElse((ps(i), ps(j)), 0L) + 1L
    }
    val bruteMax = pairCounts.values.max
    assert(top.getLong(2) == bruteMax)
    assert(pairCounts((top.getLong(0), top.getLong(1))) == top.getLong(2))
    // descending support with (p_a, p_b) tie order
    val supports = rows.map(_.getLong(2))
    assert(supports.zip(supports.tail).forall { case (a, c) => a >= c })
  }

  test("q_item_cosine: cosine in (0, 1] and support bounded by item counts") {
    val rows = run(Round10lQueries.queries, "q_item_cosine").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (cooc, na, nb, cos) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(cooc >= 2 && cooc <= math.min(na, nb))
      assert(cos > 0.0 && cos <= 1.0)
      assert(cos == cooc.toDouble / math.sqrt((na * nb).toDouble))
    }
  }

  // ---- 10w: conversion latency -------------------------------------------

  test("q_conversion_latency_hist: buckets cover disjoint log2 ranges") {
    val rows = run(Round10wQueries.queries, "q_conversion_latency_hist")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (b, lo, hi) = (r.getInt(0), r.getLong(2), r.getLong(3))
      assert(lo <= hi)
      // bucket = floor(log2(latency + 1))
      assert((1L << b) <= lo + 1 && hi + 1 < (2L << b))
    }
  }

  test("q_conversion_latency_quantiles: p50 <= p90, exact data points") {
    val rows = run(Round10wQueries.queries,
      "q_conversion_latency_quantiles").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3))
      assert(r.getLong(1) > 0)
    }
  }

  test("q_step_latency_compare: chained medians are nonnegative") {
    val rows = run(Round10wQueries.queries, "q_step_latency_compare")
      .collect()
    assert(rows.length == 2)
    rows.foreach(r => assert(r.getLong(2) >= 0))
    // click→purchase population is a subset of view→click converters
    val byStep = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStep("2_click_to_purchase") <= byStep("1_view_to_click"))
  }

  // ---- 10v: randomization inference --------------------------------------

  test("q_randomization_test: p-value is the exact placebo rank") {
    val r = run(Round10vQueries.queries, "q_randomization_test").collect()(0)
    val (nP, nE) = (r.getLong(3), r.getLong(4))
    assert(nP == 20)
    assert(nE >= 0 && nE <= nP)
    assert(r.getDouble(5) == (1 + nE).toDouble / (1 + nP).toDouble)
    // an md5-coin "treatment" has no real effect: the permutation test
    // must NOT reject at alpha = 1/21 (the smallest attainable level)
    assert(r.getDouble(5) > 1.0 / 21.0)
  }

  test("q_placebo_distribution: k=0 row present plus 20 placebos") {
    val rows = run(Round10vQueries.queries, "q_placebo_distribution")
      .collect()
    assert(rows.length == 21)
    assert(rows.map(_.getInt(0)).sameElements(0 to 20))
    // arms partition the same user population under every relabeling
    val totals = rows.map(r => r.getLong(1) + r.getLong(2)).distinct
    assert(totals.length == 1)
  }

  test("q_perm_test_strata: stratified p-value well-formed and non-reject") {
    val r = run(Round10vQueries.queries, "q_perm_test_strata").collect()(0)
    val (nP, nE) = (r.getLong(1), r.getLong(2))
    assert(nP == 20)
    assert(r.getDouble(3) == (1 + nE).toDouble / (1 + nP).toDouble)
    assert(r.getDouble(3) > 1.0 / 21.0)
  }

  // ---- 10u: ClickHouse aggregate analogs --------------------------------

  test("q_bounding_ratio: slope equals the endpoint quotient") {
    val rows = run(Round10uQueries.queries, "q_bounding_ratio").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (fc, lc, fu, lu) = (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))
      assert(fu <= lu)
      if (lu > fu)
        assert(r.getDouble(6) == (lc - fc).toDouble / (lu - fu).toDouble)
    }
  }

  test("q_delta_sum: nonnegative and zero for single-event users") {
    val rows = run(Round10uQueries.queries, "q_delta_sum").collect()
    rows.foreach { r =>
      assert(r.getLong(2) >= 0)
      if (r.getLong(1) == 1) assert(r.getLong(2) == 0)
    }
  }

  test("q_sequence_next_node: users counted once, types from the alphabet") {
    val rows = run(Round10uQueries.queries, "q_sequence_next_node")
      .collect()
    val alphabet = Set("view", "click", "purchase", "signup", "error")
    rows.foreach(r => assert(alphabet.contains(r.getString(0))))
    // every counted user has a view->click chain with a successor:
    // bounded above by the total user population
    val nUsers = graft.Tables(spark, sf0001, "events")
      .select("user_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum <= nUsers)
  }

  // ---- 10t: recommender holdout evaluation ------------------------------

  test("q_rec_holdout_hitrate: hits within covered within all") {
    val r = run(Round10tQueries.queries, "q_rec_holdout_hitrate")
      .collect()(0)
    val (n, nc, nh) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nh <= nc && nc <= n)
    if (nc > 0) assert(r.getDouble(3) == nh.toDouble / nc.toDouble)
    if (n > 0) assert(r.getDouble(4) == nh.toDouble / n.toDouble)
  }

  test("q_rec_popularity_baseline: hit count bounded by items") {
    val r = run(Round10tQueries.queries, "q_rec_popularity_baseline")
      .collect()(0)
    val (n, nh) = (r.getLong(0), r.getLong(1))
    assert(nh <= n)
    if (n > 0) assert(r.getDouble(2) == nh.toDouble / n.toDouble)
  }

  test("q_rec_catalog_coverage: covered subsets and ratio arithmetic") {
    val r = run(Round10tQueries.queries, "q_rec_catalog_coverage")
      .collect()(0)
    val (cat, recced, td, tcov) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(recced <= cat)
    assert(tcov <= td)
    if (cat > 0) assert(r.getDouble(4) == recced.toDouble / cat.toDouble)
    if (td > 0) assert(r.getDouble(5) == tcov.toDouble / td.toDouble)
  }

  // ---- 10s: uplift modeling --------------------------------------------

  test("q_uplift_by_segment: rates are the exact cell ratios") {
    val rows = run(Round10sQueries.queries, "q_uplift_by_segment").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nT, cT, nC, cC) = (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))
      assert(cT <= nT && cC <= nC)
      if (nT > 0) assert(r.getDouble(5) == cT.toDouble / nT.toDouble)
      if (nC > 0) assert(r.getDouble(6) == cC.toDouble / nC.toDouble)
    }
  }

  test("q_qini_curve: prefix is monotone in k and ends at the totals") {
    val rows = run(Round10sQueries.queries, "q_qini_curve").collect()
    val ks = rows.map(_.getInt(0))
    assert(ks.sameElements(1 to rows.length))
    val cums = rows.map(_.getLong(3))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
    val cells = run(Round10sQueries.queries, "q_uplift_by_segment")
      .collect()
    assert(rows.last.getLong(3) == cells.map(_.getLong(1)).sum)
    assert(rows.last.getLong(4) == cells.map(_.getLong(2)).sum)
  }

  test("q_srm_check: an md5 coin never trips the 3-sigma SRM gate") {
    val rows = run(Round10sQueries.queries, "q_srm_check").collect()
    rows.foreach { r =>
      assert(!r.getBoolean(4),
        s"stratum ${r.getInt(0)}: chi2 ${r.getDouble(3)}")
    }
  }

  // ---- 10r: caliper matching -------------------------------------------

  test("q_caliper_match: matched subset of treated, gaps inside caliper") {
    val r = run(Round10rQueries.queries, "q_caliper_match").collect()(0)
    val (nT, nM, nC, mass) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nM <= nT)
    assert(nC <= nM)
    assert(mass <= 1000L * nM) // every matched gap <= the caliper
    if (nM > 0) assert(r.getDouble(5) == mass.toDouble / nM.toDouble)
  }

  test("q_matched_att: att equals the pair-mass ratio") {
    val r = run(Round10rQueries.queries, "q_matched_att").collect()(0)
    val (n, dy) = (r.getLong(0), r.getLong(1))
    if (n > 0) assert(r.getDouble(2) == dy.toDouble / n.toDouble)
  }

  test("q_match_balance: matching tightens the covariate SMD") {
    val rows = run(Round10rQueries.queries, "q_match_balance").collect()
      .map(r => r.getString(0) -> r).toMap
    val before = rows("before")
    val after = rows("after")
    // balances are real numbers; after-matching |SMD| must shrink
    // (nearest-neighbor within a tight caliper) — on the synthetic
    // data both exist and before is nonzero
    if (!before.isNullAt(7) && !after.isNullAt(7))
      assert(math.abs(after.getDouble(7)) <= math.abs(before.getDouble(7)))
    // matched arms have equal row counts (1:1 matching)
    assert(after.getLong(1) == after.getLong(2))
  }

  // ---- 10q: inverted-index planning -----------------------------------

  test("q_posting_gaps: spans and gaps consistent with df") {
    val rows = run(Round10qQueries.queries, "q_posting_gaps").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (df, first, last) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(first <= last)
      assert(last - first + 1 >= df) // ids are distinct
      if (df > 1) assert(r.getDouble(4) ==
        (last - first).toDouble / (df - 1).toDouble)
    }
  }

  test("q_index_bits_plan: delta encoding never beats the id-space bound") {
    val rows = run(Round10qQueries.queries, "q_index_bits_plan").collect()
    rows.foreach { r =>
      val (df, bd, bf) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(bf == 32 * df)
      // 32 raw bits for the head + >= 1 bit per delta
      assert(bd >= 32 + (df - 1))
      assert(r.getDouble(4) == bf.toDouble / bd.toDouble)
    }
  }

  test("q_skip_pointer_plan: sqrt layout arithmetic") {
    val rows = run(Round10qQueries.queries, "q_skip_pointer_plan").collect()
    rows.foreach { r =>
      val (df, k, n, w) = (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))
      assert(k * k <= df && (k + 1) * (k + 1) > df)
      assert(n == df / k)
      assert(w == n + k)
    }
  }

  // ---- 10p: market-data bars ------------------------------------------

  test("q_ohlc_daily: low <= open/close <= high, volume positive") {
    val rows = run(Round10pQueries.queries, "q_ohlc_daily").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (o, h, l, c) = (r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))
      assert(l <= o && o <= h)
      assert(l <= c && c <= h)
      assert(r.getLong(5) > 0)
    }
  }

  test("q_vwap_daily: vwap between min and max line price ratio bounds") {
    val rows = run(Round10pQueries.queries, "q_vwap_daily").collect()
    rows.foreach { r =>
      val (num, den, vwap) = (r.getDouble(2), r.getDouble(3),
        r.getDouble(4))
      assert(vwap == num / den)
      assert(vwap > 0)
    }
  }

  test("q_bollinger_daily: band geometry and window width") {
    val rows = run(Round10pQueries.queries, "q_bollinger_daily").collect()
    rows.foreach { r =>
      val (m, mean, sd, up, lo) = (r.getLong(1), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(m >= 1 && m <= 7)
      assert(sd >= 0.0)
      assert(up == mean + 2.0 * sd && lo == mean - 2.0 * sd)
      assert(up >= lo)
    }
  }

  // ---- 10o: supervised categorical encoders --------------------------

  test("q_woe_iv: WOE sign tracks the segment rate vs the global rate") {
    val rows = run(Round10oQueries.queries, "q_woe_iv").collect()
    assert(rows.nonEmpty)
    val gt = rows.map(_.getLong(2)).sum
    val bt = rows.map(_.getLong(3)).sum
    rows.foreach { r =>
      val (g, b, woe) = (r.getLong(2), r.getLong(3), r.getDouble(4))
      // smoothed odds-ratio > 1 <=> woe > 0 (ln is monotone)
      val num = (2 * g + 1) * (2 * bt + 5)
      val den = (2 * b + 1) * (2 * gt + 5)
      assert((num > den) == (woe > 0), s"segment ${r.getString(0)}")
    }
  }

  test("q_target_encode_loo: closed form matches per-row leave-one-out") {
    val rows = run(Round10oQueries.queries, "q_target_encode_loo").collect()
    rows.foreach { r =>
      val (n, g) = (r.getLong(1), r.getLong(2))
      if (g > 0 && n > 1)
        assert(r.getDouble(3) == (g - 1).toDouble / (n - 1).toDouble)
      if (n - g > 0 && n > 1)
        assert(r.getDouble(4) == g.toDouble / (n - 1).toDouble)
    }
  }

  test("q_kfold_target_encode: in/out cells partition each segment") {
    val rows = run(Round10oQueries.queries, "q_kfold_target_encode")
      .collect()
    rows.groupBy(_.getString(0)).foreach { case (_, cells) =>
      val nTot = cells.head.getLong(2) + cells.head.getLong(4)
      cells.foreach { c =>
        assert(c.getLong(2) + c.getLong(4) == nTot) // n_in + n_out const
        assert(c.getLong(3) <= c.getLong(2))        // g_in <= n_in
      }
      assert(cells.map(_.getLong(1)).distinct.length == cells.length)
    }
  }

  // ---- 10n: Shapley attribution --------------------------------------

  test("q_shapley_attribution: efficiency — shares sum to the grand value") {
    val phis = run(Round10nQueries.queries, "q_shapley_attribution")
      .collect()
    val lat = run(Round10nQueries.queries, "q_coalition_values").collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    // sum of phi*24 over channels == 24 * (v(full) - v(empty))
    assert(phis.map(_.getLong(1)).sum == 24L * (lat(15L) - lat(0L)))
    phis.foreach(r => assert(r.getDouble(2) == r.getLong(1).toDouble / 24.0))
  }

  test("q_coalition_values: v monotone under set inclusion") {
    val lat = run(Round10nQueries.queries, "q_coalition_values").collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    for (s <- 0 until 16; b <- Seq(1, 2, 4, 8) if (s & b) == 0)
      assert(lat(s.toLong) <= lat((s | b).toLong), s"v($s) > v(${s | b})")
    // v(S) equals the sum of exact-subset conversions it covers
    val exact = run(Round10nQueries.queries, "q_coalition_values").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    for (s <- 0 until 16) {
      val expected = (0 until 16)
        .filter(m => (m & s) == m).map(m => exact(m.toLong)).sum
      assert(lat(s.toLong) == expected, s"v($s)")
    }
  }

  test("q_attribution_compare: the three rules conserve total credit") {
    val rows = run(Round10nQueries.queries, "q_attribution_compare")
      .collect()
    val lat = run(Round10nQueries.queries, "q_coalition_values").collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(rows.map(_.getLong(1)).sum == 24L * (lat(15L) - lat(0L)))
    // last-touch and linear distribute over converters WITH touches:
    // 24*(touched converters) and 12*(touched converters) respectively
    val touched = lat(15L) - lat(0L)
    assert(rows.map(_.getLong(2)).sum == touched)
    assert(rows.map(_.getLong(3)).sum == 12L * touched)
  }

  // ---- 10m: Jaro-Winkler fuzzy matching ------------------------------

  test("JaroWinkler expression matches the DuckDB-pinned battery bitwise") {
    import graft.expressions.JaroWinklerFn.jw
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    // expected values are DuckDB jaro_winkler_similarity outputs,
    // captured at 17 significant digits (bitwise for doubles)
    val battery = Seq(
      ("martha", "marhta", 0.96111111111111114),
      ("dixon", "dicksonx", 0.81333333333333324),
      ("abcdef", "abxxxx", 0.55555555555555547), // sub-0.7: NO boost
      ("ab", "ba", 0.0),
      ("a", "", 0.0),
      ("", "a", 0.0),
      ("", "", 0.0), // both empty is 0, not 1 (DuckDB semantics)
      ("a", "a", 1.0),
      ("abc", "acb", 0.55555555555555547),
      ("crate", "trace", 0.73333333333333339),
      ("dwayne", "duane", 0.84000000000000008),
      ("Customer#000000001", "Customer#000000010", 0.98888888888888893),
      ("abcde", "abdce", 0.94666666666666655),
      ("xyz", "zyx", 0.55555555555555547),
      ("aa", "aaaa", 0.8666666666666667),
      // odd mismatched-aligned-match counts: pin the FLOORED integer
      // halving of transpositions (tFull/2, rapidfuzz semantics) —
      // float halving would yield e.g. 0.625 on the first pair
      ("ab##bdb2", "#ab", 0.68055555555555547),
      ("abcdef", "badcfe", 0.83333333333333337),
      ("information", "informant", 0.94141414141414137),
      ("abcd", "acbd", 0.92499999999999993),
      ("jellyfish", "smellyfish", 0.89629629629629637))
    battery.foreach { case (a, b, expected) =>
      assert(jw(u(a), u(b)) == expected, s"jw($a, $b)")
      assert(jw(u(b), u(a)) == jw(u(a), u(b)), s"symmetry jw($a, $b)")
    }
  }

  test("q_jw_blocked_pairs: bucket histogram accounts for every blocked pair") {
    val rows = run(Round10mQueries.queries, "q_jw_blocked_pairs").collect()
    val total = rows.map(_.getLong(1)).sum
    val sizes = graft.Tables(spark, sf0001, "customer")
      .groupBy(expr("c_custkey div 100")).count().collect().map(_.getLong(1))
    val expected = sizes.map(n => n * (n - 1) / 2).sum
    assert(total == expected)
    rows.foreach(r => assert(r.getLong(0) >= 0 && r.getLong(0) <= 1000))
  }

  test("q_jw_part_dedup: scores in [0.8, 1) and blocked by first word") {
    val rows = run(Round10mQueries.queries, "q_jw_part_dedup").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(1) != r.getString(2))
      assert(r.getString(1).startsWith(r.getString(0) + " "))
      assert(r.getString(2).startsWith(r.getString(0) + " "))
      val jw = r.getDouble(3)
      assert(jw >= 0.8 && jw < 1.0)
    }
  }

  test("q_item_lift: lift equals its exact integer numerator/denominator") {
    val rows = run(Round10lQueries.queries, "q_item_lift").collect()
    rows.foreach { r =>
      val (cooc, num, den, lift) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(cooc >= 3)
      assert(lift == num.toDouble / den.toDouble)
      assert(num > 0 && den > 0)
    }
  }
}
