package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench regression gate's parser + flag logic, unit-tested against
  * the COMMITTED baseline file (r6 verdict #1: the r6 gate shipped with
  * a regex that parsed 0 of its own baseline's 317 entries, so the
  * "machine-checked 2x gate" never fired — a parser with zero tests
  * guarding a CI gate). No Spark session needed: these are pure
  * functions precisely so they can be pinned here.
  */
class BenchGateSpec extends AnyFunSuite {

  private lazy val committed: Map[String, Double] = {
    val p = java.nio.file.Paths.get("BENCH_BASELINE.json")
    assert(java.nio.file.Files.exists(p), "BENCH_BASELINE.json missing")
    Bench.parseBaseline(
      new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
  }

  test("the committed BENCH_BASELINE.json parses to the full floor map") {
    assert(committed.size >= 317,
      s"parsed only ${committed.size} floors — the gate would be inert")
    assert(committed.get("q_hash_agg").exists(_ > 0))
    assert(committed.get("dedup_exact").exists(_ > 0))
    // the non-query "note" field is a string and must not parse as a floor
    assert(!committed.contains("note"))
  }

  test("parser tolerates both compact and pretty-printed colons") {
    val b = Bench.parseBaseline("""{"a":1.5,"b": 0.25, "c" : 3}""")
    assert(b == Map("a" -> 1.5, "b" -> 0.25, "c" -> 3.0))
  }

  test("2x-over-floor is flagged for floors where 2x dominates the delta") {
    val flagged = Bench.gate(Seq("q" -> 3.3), Map("q" -> 1.6))
    assert(flagged.map(_._1) == Seq("q"))
    assert(math.abs(flagged.head._2 - 3.3 / 1.6) < 1e-9)
  }

  test("a tiny-floor query degrading past floor+1s is flagged (r6 hole)") {
    // the exact case the r6 gate's sub-0.3s exemption hid:
    // multimodal_chunk_plan 0.11 -> 1.83 s (16x, invisible to the gate)
    assert(Bench.gate(Seq("m" -> 1.83), Map("m" -> 0.11)).nonEmpty)
  }

  test("sub-second floors tolerate up to +1.5s of harness noise") {
    // 0.3 -> 1.0 s is >2x but within the absolute-delta tolerance that
    // replaces the old blanket sub-0.3 exemption; 0.33 -> 1.53 s is the
    // exact concurrent-JIT flap a 356-query sweep produced on identical
    // code (warm re-measure at the floor) — also tolerated
    assert(Bench.gate(Seq("s" -> 1.0), Map("s" -> 0.3)).isEmpty)
    assert(Bench.gate(Seq("j" -> 1.53), Map("j" -> 0.33)).isEmpty)
    // but the tolerance is bounded: past floor+1.5 the flag fires
    assert(Bench.gate(Seq("x" -> 1.9), Map("x" -> 0.33)).nonEmpty)
  }

  test("heavy queries are not flagged for sub-2x run-to-run noise") {
    assert(Bench.gate(Seq("g" -> 5.4), Map("g" -> 4.5)).isEmpty)
  }

  test("queries without a committed floor are not flagged") {
    assert(Bench.gate(Seq("new_query" -> 99.0), Map("other" -> 1.0)).isEmpty)
  }

  test("flags sort worst-ratio-first") {
    val flagged = Bench.gate(
      Seq("a" -> 3.0, "b" -> 10.0),
      Map("a" -> 1.0, "b" -> 1.0))
    assert(flagged.map(_._1) == Seq("b", "a"))
  }

  // ---- tolerance pin (r7 verdict #4) -------------------------------
  // The absolute-delta clause is PINNED at floor + 1.5 s. It moved
  // 1.0 -> 1.5 in r7 (with per-pass JIT false-positive evidence) and
  // two consecutive rounds of definition movement is the limit: any
  // future change to the constant must ship with per-pass JIT evidence
  // in the commit AND update these exact-boundary cases.
  test("gate tolerance is pinned at floor + 1.5 s (boundary cases)") {
    // floor 1.0: threshold = max(2.0, 2.5) = 2.5 — the +1.5 clause rules
    assert(Bench.gate(Seq("a" -> 2.6), Map("a" -> 1.0)).nonEmpty,
      "floor+1.6 must be flagged")
    assert(Bench.gate(Seq("a" -> 2.4), Map("a" -> 1.0)).isEmpty,
      "floor+1.4 must NOT be flagged")
    // floor 3.0: threshold = max(6.0, 4.5) = 6.0 — the 2x clause rules
    assert(Bench.gate(Seq("b" -> 6.1), Map("b" -> 3.0)).nonEmpty)
    assert(Bench.gate(Seq("b" -> 5.9), Map("b" -> 3.0)).isEmpty)
  }

  // ---- shelter watchlist (r8 verdict #2) ---------------------------
  // The +1.5 s clause shields sub-second floors from the gate; the
  // watchlist makes everything sheltered above 2x floor visible
  // without gating on it.
  test("watchlist catches >2x-floor queries the +1.5s clause shelters") {
    // 0.25 floor, 1.5 s reading: 6x ratio but <= floor+1.5 — gate
    // silent, watchlist must carry it (the r8 q_freshness_lag case)
    assert(Bench.gate(Seq("w" -> 1.5), Map("w" -> 0.25)).isEmpty)
    val w = Bench.watchlist(Seq("w" -> 1.5), Map("w" -> 0.25))
    assert(w.map(_._1) == Seq("w"))
    assert(math.abs(w.head._2 - 6.0) < 1e-9)
  }

  test("watchlist and gate are disjoint: a gated query is not watchlisted") {
    // past floor+1.5 the gate fires and the watchlist stays silent
    assert(Bench.gate(Seq("g" -> 2.0), Map("g" -> 0.25)).nonEmpty)
    assert(Bench.watchlist(Seq("g" -> 2.0), Map("g" -> 0.25)).isEmpty)
  }

  test("watchlist ignores queries inside 2x floor or without a floor") {
    assert(Bench.watchlist(Seq("a" -> 0.4), Map("a" -> 0.25)).isEmpty)
    assert(Bench.watchlist(Seq("new" -> 9.0), Map("other" -> 1.0)).isEmpty)
  }

  // ---- re-measure coverage (r7 verdict #2) -------------------------
  test("a sub-3s gate-flagged query gets the extra passes") {
    // the exact r7 escape: q_source_diversity 2.48 s vs floor 0.214 —
    // under the 3.0 s outlier cutoff, so the old rule never re-measured
    // it and the flag shipped on a 2-pass cold reading
    assert(Bench.needsRemeasure(2.48, cutoff = 3.0, floor = Some(0.214)))
  }

  test("a watchlist-sheltered query gets the extra passes (r8 verdict #1)") {
    // the exact r8 escape: q_hash_agg 1.63 s vs floor 0.724 — above 2x
    // floor but under floor+1.5, so the gate stayed silent AND the old
    // rule never re-measured it; the interference-shaped mid-sweep
    // reading shipped as the query's time. Anything past 2x floor now
    // gets the late-sweep passes (the gate itself is unchanged).
    assert(Bench.needsRemeasure(1.63, cutoff = 3.0, floor = Some(0.724)))
    assert(Bench.gate(Seq("a" -> 1.63), Map("a" -> 0.724)).isEmpty,
      "gate must stay silent — re-measure trigger only")
  }

  test("outlier cutoff still triggers re-measure without a floor") {
    assert(Bench.needsRemeasure(4.0, cutoff = 3.0, floor = None))
    assert(!Bench.needsRemeasure(2.0, cutoff = 3.0, floor = None))
  }

  test("a query at its floor is not re-measured") {
    assert(!Bench.needsRemeasure(0.25, cutoff = 3.0, floor = Some(0.214)))
    // inside the gate tolerance: no flag, no extra passes
    assert(!Bench.needsRemeasure(1.5, cutoff = 3.0, floor = Some(0.9)))
  }

  test("penalty entries (both passes failed) are never re-measured") {
    assert(!Bench.needsRemeasure(600.0, cutoff = 3.0, floor = Some(0.2)))
  }

  test("a synthetic slowdown against the COMMITTED baseline is flagged") {
    // end-to-end over the real file: parse -> gate; proves the shipped
    // artifact and the arming logic compose (the r6 failure mode was
    // each half "working" while the composition was a no-op)
    val floor = committed("q_hash_agg")
    val flagged = Bench.gate(Seq("q_hash_agg" -> (3 * floor + 2)), committed)
    assert(flagged.map(_._1) == Seq("q_hash_agg"))
  }
}
