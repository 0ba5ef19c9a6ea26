package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-10 batches at sf0.001 (exact
  * values ride the DuckDB oracle gate at sf0.01/sf0.001; these pin the
  * properties a hash compare can't express).
  */
class Round10QueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(m: Map[String, (org.apache.spark.sql.SparkSession,
    String) => org.apache.spark.sql.DataFrame], name: String) =
    m(name)(spark, sf0001)

  // ---- 10a: planner-lifted band joins --------------------------------

  test("q_range_join_auto matches the hand-decomposed q_bucketed_range_join") {
    val auto = run(Round10aQueries.queries, "q_range_join_auto").collect()(0)
    val hand = Round9eQueries.queries("q_bucketed_range_join")(
      spark, sf0001).collect()(0)
    // same semantics, two routes: naive API + optimizer rule vs
    // hand-written bucket decomposition
    assert(auto.getLong(0) == hand.getLong(0))
    assert(auto.getLong(1) == hand.getLong(1))
    assert(auto.getLong(2) == hand.getLong(2))
    assert(auto.getDouble(3) == hand.getDouble(3))
  }

  test("q_between_join_auto: asymmetric band equals the brute-force count") {
    import org.apache.spark.sql.functions._
    val auto = run(Round10aQueries.queries, "q_between_join_auto").collect()(0)
    val ev = graft.Tables(spark, sf0001, "events")
      .select(col("event_type"), unix_micros(col("ts")).as("us")).collect()
    val vs = ev.filter(_.getString(0) == "view").map(_.getLong(1))
    val ps = ev.filter(_.getString(0) == "purchase").map(_.getLong(1))
    val expected = ps.map(p => vs.count(v =>
      p >= v - 30000000L && p <= v + 90000000L).toLong).sum
    assert(auto.getLong(0) == expected)
  }

  test("q_band_join_width_sweep: pair counts monotone in the band width") {
    val rows = run(Round10aQueries.queries, "q_band_join_width_sweep")
      .collect()
    val counts = rows.sortBy(_.getLong(0)).map(_.getLong(1))
    assert(counts.zip(counts.tail).forall { case (a, b) => a <= b })
  }

  // ---- 10b: behavioral combinators -----------------------------------

  test("q_retention_cohorts: flag chain is monotone") {
    val r = run(Round10bQueries.queries, "q_retention_cohorts").collect()(0)
    val (users, d0, d1, d7) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(d0 <= users && d1 <= d0 && d7 <= d0)
  }

  test("q_window_funnel_sweep: level mass never shrinks as windows widen") {
    val rows = run(Round10bQueries.queries, "q_window_funnel_sweep")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byWindow = rows.groupBy(_._1).view.mapValues(_.map(x =>
      x._2 -> x._3).toMap).toMap
    val windows = byWindow.keys.toSeq.sorted
    // users at level >= 2 can only grow with the window
    def atLeast2(w: Long) = byWindow(w).collect {
      case (l, n) if l >= 2 => n
    }.sum
    val masses = windows.map(atLeast2)
    assert(masses.zip(masses.tail).forall { case (a, b) => a <= b })
    // total population identical across windows
    val totals = windows.map(w => byWindow(w).values.sum).distinct
    assert(totals.size == 1)
  }

  test("q_uniq_upto: cap respected and consistent with exact distinct") {
    val rows = run(Round10bQueries.queries, "q_uniq_upto").collect()
    rows.foreach { r =>
      assert(r.getLong(1) <= 51L)
      assert(r.getBoolean(2) == (r.getLong(1) == 51L) ||
        (!r.getBoolean(2) && r.getLong(1) <= 50L))
    }
  }

  // ---- 10c: weighted order statistics --------------------------------

  test("q_weighted_median: brute-force weighted median per flag") {
    val rows = run(Round10cQueries.queries, "q_weighted_median").collect()
    val data = graft.Tables(spark, sf0001, "lineitem")
      .select("l_returnflag", "l_extendedprice", "l_quantity").collect()
      .map(r => (r.getString(0), r.getDouble(1),
        BigDecimal(r.getDouble(2)).setScale(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val flag = r.getString(0)
      val xs = data(flag).map(x => (x._2, x._3)).sortBy(_._1)
      val tot = xs.map(_._2).sum
      var cum = BigDecimal(0)
      val expected = xs.find { case (_, w) =>
        cum += w; cum * 2 >= tot
      }.get._1
      assert(r.getDouble(2) == expected, s"$flag")
      assert(r.getDouble(1) == tot.toDouble)
    }
  }

  test("q_weighted_deciles: monotone within flag, median equals d5") {
    val dec = run(Round10cQueries.queries, "q_weighted_deciles").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    dec.groupBy(_._1).foreach { case (_, g) =>
      val vs = g.sortBy(_._2).map(_._3)
      assert(vs.zip(vs.tail).forall { case (a, b) => a <= b })
    }
    val med = run(Round10cQueries.queries, "q_weighted_median").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    dec.filter(_._2 == 5).foreach { case (f, _, v) => assert(v == med(f)) }
  }

  test("q_newsvendor_stock: service level >= 0.8 everywhere") {
    run(Round10cQueries.queries, "q_newsvendor_stock").collect().foreach {
      r => assert(r.getDouble(3) >= 0.8 && r.getDouble(3) <= 1.0)
    }
  }

  // ---- 10d: LPA communities -------------------------------------------

  test("q_lpa_communities: sizes positive, community ids are node ids") {
    val rows = run(Round10dQueries.queries, "q_lpa_communities").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val sizes = rows.map(_.getLong(1))
    assert(sizes.zip(sizes.tail).forall { case (a, b) => a >= b })
    assert(sizes.forall(_ >= 1))
  }

  test("q_lpa_modularity: Q in [-0.5, 1], members reconcile") {
    val r = run(Round10dQueries.queries, "q_lpa_modularity").collect()(0)
    val q = r.getDouble(2)
    assert(q >= -0.5 && q <= 1.0)
    assert(r.getLong(1) <= r.getLong(0)) // intra edges <= all edges
  }

  // ---- 10e: text policy gates ----------------------------------------

  test("q_policy_gate_matrix: doc counts total, mask bounded") {
    val rows = run(Round10eQueries.queries, "q_policy_gate_matrix").collect()
    val total = rows.map(_.getLong(1)).sum
    val nDocs = graft.Tables(spark, sf0001, "documents").count()
    assert(total == nDocs)
    assert(rows.forall(r => r.getInt(0) >= 0 && r.getInt(0) <= 15))
  }

  test("q_lexicon_score: flagged never exceeds tokens") {
    run(Round10eQueries.queries, "q_lexicon_score").collect().foreach { r =>
      assert(r.getLong(3) <= r.getLong(2))
    }
  }

  // ---- 10f: MV workload planning -------------------------------------

  test("q_mv_selection_greedy: marginal benefits non-increasing, 3 picks") {
    val rows = run(Round10fQueries.queries, "q_mv_selection_greedy")
      .collect().sortBy(_.getInt(0))
    assert(rows.length == 3)
    val bens = rows.map(_.getLong(2))
    assert(bens.zip(bens.tail).forall { case (a, b) => a >= b })
    assert(rows.map(_.getString(1)).distinct.length == 3)
  }

  test("q_workload_coverage: w_total covered round 1, flag+month never") {
    val rows = run(Round10fQueries.queries, "q_workload_coverage").collect()
      .map(r => r.getString(0) -> r.getInt(2)).toMap
    assert(rows("w_total") == 1) // any pick serves the grand total
    assert(rows("w_flag_month") == 0) // no candidate view covers it
  }

  test("q_rollup_cost_model: independence never underestimates upward") {
    run(Round10fQueries.queries, "q_rollup_cost_model").collect().foreach {
      r => assert(r.getDouble(3) <= 1.0 + 1e-9) // actual <= estimate
    }
  }

  // ---- 10g: Bayesian --------------------------------------------------

  test("q_beta_binomial_ab: posterior means in (0,1), z finite") {
    val r = run(Round10gQueries.queries, "q_beta_binomial_ab").collect()(0)
    Seq(r.getDouble(4), r.getDouble(5)).foreach(m =>
      assert(m > 0.0 && m < 1.0))
    assert(!r.getDouble(6).isNaN && !r.getDouble(6).isInfinite)
  }

  test("q_eb_shrinkage: shrinkage pulls toward the global mean") {
    val rows = run(Round10gQueries.queries, "q_eb_shrinkage").collect()
    val gs = rows.map(_.getLong(2)).sum
    val gn = rows.map(_.getLong(1)).sum
    val m = gs.toDouble / gn
    rows.foreach { r =>
      val raw = r.getDouble(3); val shrunk = r.getDouble(4)
      // shrunk lies between raw and the global mean
      assert(shrunk >= math.min(raw, m) - 1e-12 &&
        shrunk <= math.max(raw, m) + 1e-12)
    }
  }

  test("q_thompson_allocation: shares positive, sum to 1") {
    val r = run(Round10gQueries.queries, "q_thompson_allocation").collect()(0)
    val shares = Seq(r.getDouble(6), r.getDouble(7), r.getDouble(8))
    assert(shares.forall(_ > 0.0))
    assert(math.abs(shares.sum - 1.0) < 1e-12)
  }

  // ---- 10h: event-time hygiene ---------------------------------------

  test("q_late_event_audit: lateness monotone DECREASING in the delay") {
    val rows = run(Round10hQueries.queries, "q_late_event_audit").collect()
      .sortBy(_.getLong(0))
    val lates = rows.map(_.getLong(2))
    assert(lates.zip(lates.tail).forall { case (a, b) => a >= b })
    // block-decomposed prefix equals the naive per-event prefix (W=0)
    val ev = graft.Tables(spark, sf0001, "events")
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    var mx = Long.MinValue
    var late0 = 0L
    ev.foreach { case (_, us) =>
      if (us < mx) late0 += 1
      if (us > mx) mx = us
    }
    assert(rows.head.getLong(2) == late0)
  }

  test("q_late_by_user: decile buckets partition the user population") {
    val rows = run(Round10hQueries.queries, "q_late_by_user").collect()
    val users = rows.map(_.getLong(1)).sum
    val distinct = graft.Tables(spark, sf0001, "events")
      .select("user_id").distinct().count()
    assert(users == distinct)
    assert(rows.forall(r => r.getInt(0) >= 0 && r.getInt(0) <= 10))
  }

  // ---- 10i: Markov attribution ---------------------------------------

  test("q_absorbing_conversion: probabilities in [0,1]") {
    run(Round10iQueries.queries, "q_absorbing_conversion").collect()
      .foreach(r => assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0))
  }

  test("q_markov_attribution: removal can only reduce conversion; shares sum to 1") {
    val rows = run(Round10iQueries.queries, "q_markov_attribution").collect()
    rows.foreach { r =>
      assert(r.getDouble(2) <= r.getDouble(1) + 1e-12) // v_removed <= v_base
      assert(r.getDouble(3) >= -1e-12) // removal effect non-negative
    }
    val shares = rows.map(_.getDouble(4))
    if (shares.exists(_ > 0)) assert(math.abs(shares.sum - 1.0) < 1e-9)
  }

  test("q_transition_entropy: 0 <= H <= ln(|alphabet|)") {
    run(Round10iQueries.queries, "q_transition_entropy").collect().foreach {
      r => assert(r.getDouble(2) >= -1e-12 &&
        r.getDouble(2) <= math.log(6.0) + 1e-9)
    }
  }

  // ---- 10k: format roundtrips ----------------------------------------

  test("format roundtrips: counts honest, all integrity flags true") {
    Seq("q_csv_roundtrip", "q_json_roundtrip", "q_partitioned_roundtrip")
      .foreach { q =>
        val r = run(Round10kQueries.queries, q).collect()(0)
        assert(r.getLong(0) == r.getLong(1), s"$q: row counts differ")
        val flags = (2 until r.length).collect {
          case i if r.get(i).isInstanceOf[Boolean] => r.getBoolean(i)
        }
        assert(flags.nonEmpty && flags.forall(identity),
          s"$q: integrity flag false: $r")
      }
  }

  // ---- 10j: token budget ---------------------------------------------

  test("q_token_budget_fit: allocations within caps, near budget") {
    val rows = run(Round10jQueries.queries, "q_token_budget_fit").collect()
    rows.foreach(r => assert(r.getLong(4) <= r.getLong(3)))
    val plan = run(Round10jQueries.queries, "q_epoch_plan").collect()(0)
    val (budget, allocated) = (plan.getLong(0), plan.getLong(2))
    assert(allocated <= budget)
    // integer-div remainders only: within n_sources tokens of the budget
    // unless every source hit its cap
    val allCapped = rows.forall(r => r.getLong(4) == r.getLong(3))
    if (!allCapped)
      assert(budget - allocated <= 3L * rows.length)
  }

  test("q_mix_kl_drift: zero drift when alloc proportional to tokens") {
    val rows = run(Round10jQueries.queries, "q_mix_kl_drift").collect()
    // contributions can be negative per source, but p and q are proper
    rows.foreach { r =>
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
    }
  }
}
