package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** BandJoinRewrite turns the naive keyless band join
  * `a.join(b, abs(a.ts - b.ts) <= W)` into a ±1-bucket equi-join
  * (r9 verdict #2). The session installs GraftExtensions, so these are
  * end-to-end checks on the plans a user actually gets:
  * the rewrite FIRES on the exact shape (no BNLJ, identical rows,
  * residual conjuncts preserved, negative timestamps bucketed
  * correctly) and does NOT fire on anything else (equi-keyed joins,
  * outer joins, non-integral bands).
  */
class BandJoinRewriteSpec extends AnyFunSuite with SparkSuite {

  import scala.jdk.CollectionConverters._
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  private def longDf(name: String, vs: Seq[Long]): DataFrame =
    spark.createDataFrame(
      vs.zipWithIndex.map { case (v, i) => Row(i.toLong, v) }.asJava,
      StructType(Seq(StructField(s"${name}_id", LongType, nullable = false),
        StructField(s"${name}_ts", LongType, nullable = false))))

  private def hasNestedLoop(df: DataFrame): Boolean =
    PlanSignature.nodes(df.queryExecution.executedPlan).exists {
      case _: BroadcastNestedLoopJoinExec | _: CartesianProductExec => true
      case _ => false
    }

  // timestamps spanning bucket boundaries, including NEGATIVE values
  // (floor bucketing, not truncation toward zero) and exact-band edges
  private val aTs = Seq(-250L, -100L, -1L, 0L, 7L, 99L, 100L, 101L, 350L, 1000L)
  private val bTs = Seq(-300L, -150L, -99L, 0L, 3L, 50L, 199L, 200L, 201L, 449L, 950L)

  private def bruteCount(w: Long, strict: Boolean): Long =
    aTs.flatMap(a => bTs.map(b => math.abs(a - b)))
      .count(d => if (strict) d < w else d <= w).toLong

  test("naive |a-b| <= W join: BNLJ gone, rows exact, negatives correct") {
    val j = longDf("a", aTs).join(longDf("b", bTs),
      abs(col("a_ts") - col("b_ts")) <= 100L)
    assert(!hasNestedLoop(j), "band join was not decomposed:\n" +
      j.queryExecution.executedPlan.toString)
    assert(j.count() == bruteCount(100L, strict = false))
  }

  test("bucketing is wrap-free at the Long.MinValue edge") {
    // floor-multiple bucketing (x - pmod(x, w)) wrapped here, putting
    // the qualifying pair in non-adjacent buckets and LOSING it
    val lows = Seq(Long.MinValue + 7, Long.MinValue + 8, 0L, 100L)
    val j = longDf("a", lows).join(longDf("b", lows),
      abs(col("a_ts") - col("b_ts")) <= 10L)
    assert(!hasNestedLoop(j))
    val expected = lows.flatMap(a => lows.filter { b =>
      val d = a - b // same LEGACY wrap semantics as the residual
      math.abs(d) <= 10L
    }).size.toLong
    assert(j.count() == expected)
  }

  test("strict |a-b| < W matches the inclusive W-1 decomposition") {
    val j = longDf("a", aTs).join(longDf("b", bTs),
      abs(col("a_ts") - col("b_ts")) < 100L)
    assert(!hasNestedLoop(j))
    assert(j.count() == bruteCount(100L, strict = true))
  }

  test("asymmetric between() bands decompose too") {
    // lo = -40, hi = 100: the bound-PAIR shape (right side shifted by
    // lo, bucket width hi - lo)
    val j = longDf("a", aTs).join(longDf("b", bTs),
      col("a_ts").between(col("b_ts") - 40L, col("b_ts") + 100L))
    assert(!hasNestedLoop(j), "between band was not decomposed:\n" +
      j.queryExecution.executedPlan.toString)
    val expected = aTs.flatMap(a => bTs.filter(b =>
      a >= b - 40L && a <= b + 100L)).size.toLong
    assert(j.count() == expected)
  }

  test("x - y bound pairs decompose (spelled as two inequalities)") {
    val j = longDf("a", aTs).join(longDf("b", bTs),
      col("a_ts") - col("b_ts") <= 70L && col("a_ts") - col("b_ts") >= -20L)
    assert(!hasNestedLoop(j))
    val expected = aTs.flatMap(a => bTs.filter(b =>
      a - b <= 70L && a - b >= -20L)).size.toLong
    assert(j.count() == expected)
  }

  test("strict a < b - L / a >= b - U pair decomposes (r11 ADVICE gap)") {
    // the strict-upper shape the r11 pattern table missed: band is
    // a - b in [-100, -21]
    val j = longDf("a", aTs).join(longDf("b", bTs),
      col("a_ts") < col("b_ts") - 20L && col("a_ts") >= col("b_ts") - 100L)
    assert(!hasNestedLoop(j), "strict a < b - L band was not decomposed:\n" +
      j.queryExecution.executedPlan.toString)
    val expected = aTs.flatMap(a => bTs.filter(b =>
      a < b - 20L && a >= b - 100L)).size.toLong
    assert(j.count() == expected)
  }

  test("strict a > b + L / a <= b + U pair decomposes (r11 ADVICE gap)") {
    // the strict-lower mirror: band is a - b in [21, 100]
    val j = longDf("a", aTs).join(longDf("b", bTs),
      col("a_ts") > col("b_ts") + 20L && col("a_ts") <= col("b_ts") + 100L)
    assert(!hasNestedLoop(j), "strict a > b + L band was not decomposed:\n" +
      j.queryExecution.executedPlan.toString)
    val expected = aTs.flatMap(a => bTs.filter(b =>
      a > b + 20L && a <= b + 100L)).size.toLong
    assert(j.count() == expected)
  }

  test("a one-sided inequality alone is NOT rewritten") {
    val j = longDf("a", aTs).join(longDf("b", bTs),
      col("a_ts") <= col("b_ts") + 100L)
    val gen = j.queryExecution.optimizedPlan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }
    assert(gen.isEmpty, "rule fired on a half-open band")
  }

  test("sibling residual conjuncts survive the rewrite") {
    val j = longDf("a", aTs).join(longDf("b", bTs),
      abs(col("a_ts") - col("b_ts")) <= 100L && col("b_ts") > 0L)
    assert(!hasNestedLoop(j))
    val expected = aTs.flatMap(a => bTs.filter(b =>
      math.abs(a - b) <= 100L && b > 0L)).size.toLong
    assert(j.count() == expected)
  }

  test("equi-keyed band joins are left to the stock hash join") {
    // same band, plus an equi-key: Spark hash-joins on the key with the
    // band as residual — the rule must not touch it (also the
    // idempotence guard: a REWRITTEN join has an equi-key)
    val a = longDf("a", aTs).withColumn("k", col("a_id") % 2)
    val b = longDf("b", bTs).withColumn("k", col("b_id") % 2)
    val j = a.join(b, a("k") === b("k") &&
      abs(col("a_ts") - col("b_ts")) <= 100L)
    val gen = j.queryExecution.optimizedPlan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }
    assert(gen.isEmpty, "rule fired on an equi-keyed join")
  }

  test("outer band joins are not rewritten") {
    val j = longDf("a", aTs).join(longDf("b", bTs),
      abs(col("a_ts") - col("b_ts")) <= 100L, "left")
    val gen = j.queryExecution.optimizedPlan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }
    assert(gen.isEmpty, "rule fired on an outer join")
    // and the semantics stay LEFT OUTER: every a row present
    assert(j.count() >= aTs.size)
  }

  // ---- temporal bands (r10 verdict #1): raw TimestampType/DateType ----

  private def tsDf(name: String, vs: Seq[Long]): DataFrame =
    longDf(name, vs).withColumn(s"${name}_t",
      expr(s"timestamp_micros(${name}_ts * 1000000)"))
      .drop(s"${name}_ts")

  test("raw TimestampType |a.t - b.t| <= INTERVAL decomposes") {
    val j = tsDf("a", aTs).join(tsDf("b", bTs),
      abs(col("a_t") - col("b_t")) <= expr("INTERVAL '100' SECOND"))
    assert(!hasNestedLoop(j), "timestamp band join was not decomposed:\n" +
      j.queryExecution.executedPlan.toString)
    assert(j.count() == bruteCount(100L, strict = false))
  }

  test("raw TimestampType between(t - INTERVAL, t + INTERVAL) decomposes") {
    val j = tsDf("a", aTs).join(tsDf("b", bTs),
      col("a_t").between(col("b_t") - expr("INTERVAL '40' SECOND"),
        col("b_t") + expr("INTERVAL '100' SECOND")))
    assert(!hasNestedLoop(j), "timestamp between band was not decomposed:\n" +
      j.queryExecution.executedPlan.toString)
    val expected = aTs.flatMap(a => bTs.filter(b =>
      a >= b - 40L && a <= b + 100L)).size.toLong
    assert(j.count() == expected)
  }

  private def dateDf(name: String, vs: Seq[Long]): DataFrame =
    longDf(name, vs).withColumn(s"${name}_d",
      expr(s"date_add(date'2020-06-01', cast(${name}_ts / 10 as int))"))
      .drop(s"${name}_ts")

  test("raw DateType |a.d - b.d| <= INTERVAL '10' DAY decomposes") {
    val j = dateDf("a", aTs).join(dateDf("b", bTs),
      abs(col("a_d") - col("b_d")) <= expr("INTERVAL '10' DAY"))
    assert(!hasNestedLoop(j), "date band join was not decomposed:\n" +
      j.queryExecution.executedPlan.toString)
    val expected = aTs.flatMap(a => bTs.map(b =>
      math.abs(a / 10 - b / 10))).count(_ <= 10L).toLong
    assert(j.count() == expected)
  }

  test("DateType between(date_sub, date_add) bound pair decomposes") {
    val j = dateDf("a", aTs).join(dateDf("b", bTs),
      col("a_d").between(date_sub(col("b_d"), 4), date_add(col("b_d"), 10)))
    assert(!hasNestedLoop(j))
    val expected = aTs.flatMap(a => bTs.filter(b =>
      a / 10 >= b / 10 - 4L && a / 10 <= b / 10 + 10L)).size.toLong
    assert(j.count() == expected)
  }

  // ---- TimestampNTZ bands (r11 verdict #4) ---------------------------

  private def ntzDf(name: String, vs: Seq[Long]): DataFrame =
    longDf(name, vs).withColumn(s"${name}_t",
      expr(s"cast(timestamp_micros(${name}_ts * 1000000) as timestamp_ntz)"))
      .drop(s"${name}_ts")

  test("raw TimestampNTZ |a.t - b.t| <= INTERVAL decomposes") {
    val j = ntzDf("a", aTs).join(ntzDf("b", bTs),
      abs(col("a_t") - col("b_t")) <= expr("INTERVAL '100' SECOND"))
    assert(!hasNestedLoop(j), "NTZ band join was not decomposed:\n" +
      j.queryExecution.executedPlan.toString)
    assert(j.count() == bruteCount(100L, strict = false))
  }

  test("raw TimestampNTZ between(t - INTERVAL, t + INTERVAL) decomposes") {
    val j = ntzDf("a", aTs).join(ntzDf("b", bTs),
      col("a_t").between(col("b_t") - expr("INTERVAL '40' SECOND"),
        col("b_t") + expr("INTERVAL '100' SECOND")))
    assert(!hasNestedLoop(j), "NTZ between band was not decomposed:\n" +
      j.queryExecution.executedPlan.toString)
    val expected = aTs.flatMap(a => bTs.filter(b =>
      a >= b - 40L && a <= b + 100L)).size.toLong
    assert(j.count() == expected)
  }

  test("mixed NTZ/TZ band: rows stay exact whatever the analyzer does") {
    // the analyzer coerces a TZ-vs-NTZ comparison to one type (the
    // coercion Cast then normalizes through that type's epoch — exact);
    // if a Spark version ever admitted an UNcoerced mix, mixesEpochs
    // bails to the nested-loop plan. Either way the row set is exact —
    // that is the property pinned here, not the plan shape.
    val j = ntzDf("a", aTs).join(tsDf("b", bTs),
      abs(col("a_t") - col("b_t")) <= expr("INTERVAL '100' SECOND"))
    // session tz is UTC, so the coerced walls equal the TZ instants
    assert(j.count() == bruteCount(100L, strict = false))
  }

  test("year-month interval bands are NOT rewritten (variable length)") {
    val j = tsDf("a", aTs).join(tsDf("b", bTs),
      col("a_t").between(col("b_t") - expr("INTERVAL '1' MONTH"),
        col("b_t") + expr("INTERVAL '1' MONTH")))
    val gen = j.queryExecution.optimizedPlan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }
    assert(gen.isEmpty, "rule fired on a year-month interval band")
  }

  // ---- decimal bands: price-band / duplicate-payment shapes ----------

  private def decDf(name: String, vs: Seq[Long]): DataFrame =
    longDf(name, vs).withColumn(s"${name}_p",
      expr(s"cast(${name}_ts as decimal(12,2)) / 100"))
      .drop(s"${name}_ts")

  test("decimal |a.p - b.p| <= 0.50 band decomposes to unscaled buckets") {
    val j = decDf("a", aTs).join(decDf("b", bTs),
      abs(col("a_p") - col("b_p")) <= expr("CAST(0.50 AS DECIMAL(3,2))"))
    assert(!hasNestedLoop(j), "decimal band join was not decomposed:\n" +
      j.queryExecution.executedPlan.toString)
    // values are ts/100 at scale 2, so the band is |a - b| <= 50 ticks
    val expected = aTs.flatMap(a => bTs.map(b => math.abs(a - b)))
      .count(_ <= 50L).toLong
    assert(j.count() == expected)
  }

  test("decimal between(p - 0.20, p + 0.90) bound pair decomposes") {
    val j = decDf("a", aTs).join(decDf("b", bTs),
      col("a_p").between(col("b_p") - expr("CAST(0.20 AS DECIMAL(3,2))"),
        col("b_p") + expr("CAST(0.90 AS DECIMAL(3,2))")))
    assert(!hasNestedLoop(j))
    val expected = aTs.flatMap(a => bTs.filter(b =>
      a >= b - 20L && a <= b + 90L)).size.toLong
    assert(j.count() == expected)
  }

  test("wide decimals (precision > 18) are NOT rewritten") {
    val a = longDf("a", aTs).withColumn("x",
      expr("cast(a_ts as decimal(38,10))"))
    val b = longDf("b", bTs).withColumn("y",
      expr("cast(b_ts as decimal(38,10))"))
    val j = a.join(b, abs(col("x") - col("y")) <=
      expr("CAST(100 AS DECIMAL(38,10))"))
    val gen = j.queryExecution.optimizedPlan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }
    assert(gen.isEmpty, "rule fired on a non-Long-backed decimal band")
  }

  test("non-integral bands are not rewritten") {
    val a = longDf("a", aTs).withColumn("x", col("a_ts").cast("double"))
    val b = longDf("b", bTs).withColumn("y", col("b_ts").cast("double"))
    val j = a.join(b, abs(col("x") - col("y")) <= 100.5)
    val gen = j.queryExecution.optimizedPlan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }
    assert(gen.isEmpty, "rule fired on a double-typed band")
  }
}
