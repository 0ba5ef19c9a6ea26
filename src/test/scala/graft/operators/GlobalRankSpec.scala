package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** GlobalRank claims BIT-IDENTICAL results to the single-partition
  * window forms it replaces (row_number / ntile over Window.orderBy with
  * no partition) while keeping every window partitioned. These tests
  * pin that equivalence on adversarial data — heavy duplicates (so
  * bucket boundaries land inside tie runs), skew, negatives, and a
  * group smaller than the bucket count — because the production oracle
  * only exercises the three queries wired to it.
  */
class GlobalRankSpec extends AnyFunSuite with SparkSuite {

  // deterministic pseudo-random metric with long duplicate runs: id*id
  // mod 97 cycles, so ~100 rows share each of 97 values
  private def fixture(n: Int) = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, ((i.toLong * i) % 97).toDouble))
      .toDF("id", "m")
  }

  test("withRank equals the unpartitioned row_number for every row") {
    val df = fixture(9700)
    val w = Window.orderBy(col("m"), col("id"))
    val expected = df.withColumn("r", row_number().over(w).cast("long"))
    val actual = GlobalRank.withRank(df, col("m"), col("id"), "r", 16)
    assert(actual.select("id", "r").except(
      expected.select("id", "r")).isEmpty)
    assert(expected.select("id", "r").except(
      actual.select("id", "r")).isEmpty)
  }

  test("withRank is exact when buckets exceed distinct values") {
    val df = fixture(50) // 50 rows, ties, 32 requested buckets
    val w = Window.orderBy(col("m"), col("id"))
    val expected = df.withColumn("r", row_number().over(w).cast("long"))
    val actual = GlobalRank.withRank(df, col("m"), col("id"), "r")
    assert(actual.select("id", "r").except(
      expected.select("id", "r")).isEmpty)
  }

  test("withGroupRank equals the group-partitioned row_number") {
    import spark.implicits._
    // 3 skewed groups sharing the same global value range, ties inside
    // every group — global boundaries cut through all of them
    val df = (1 to 6000).map { i =>
      (s"g${i % 3}", i.toLong, ((i.toLong * 7) % 41).toDouble)
    }.toDF("grp", "id", "m")
    val w = Window.partitionBy("grp").orderBy(col("m"), col("id"))
    val expected = df.withColumn("r", row_number().over(w).cast("long"))
    val actual = GlobalRank.withGroupRank(
      df, Seq("grp"), col("m"), col("id"), "r", 8)
    assert(actual.select("grp", "id", "r").except(
      expected.select("grp", "id", "r")).isEmpty)
    assert(expected.select("grp", "id", "r").except(
      actual.select("grp", "id", "r")).isEmpty)
    // and every row_number window carries the range bucket in its
    // partition spec — never the bare low-cardinality group
    val plan = actual.queryExecution.executedPlan.toString
    assert(!"windowspecdefinition\\(grp#\\d+, __gr_metric".r
      .findFirstIn(plan).isDefined, plan)
    assert(plan.contains("__gr_bucket"), plan)
  }

  test("withNtile reproduces NTILE(4) including the uneven remainder") {
    // 9703 rows: 9703 = 4*2425 + 3, so three quartiles take 2426 rows
    // and one takes 2425 — the remainder assignment must match SQL's
    val df = fixture(9703)
    val w = Window.orderBy(col("m"), col("id"))
    val expected = df.withColumn("q", ntile(4).over(w))
    val actual = GlobalRank.withNtile(df, col("m"), col("id"), "q", 4)
    assert(actual.select("id", "q").except(
      expected.select("id", "q")).isEmpty)
    assert(expected.select("id", "q").except(
      actual.select("id", "q")).isEmpty)
  }

  test("withNtiles matches per-metric NTILE for opposed orderings") {
    import spark.implicits._
    val df = (1 to 2000)
      .map(i => (i.toLong, (i % 13).toDouble, -(i % 7).toDouble))
      .toDF("id", "a", "b")
    val expected = df
      .withColumn("qa", ntile(4).over(Window.orderBy(col("a"), col("id"))))
      .withColumn("qb", ntile(4).over(Window.orderBy(col("b"), col("id"))))
    val actual = GlobalRank.withNtiles(df,
      Seq("a" -> "qa", "b" -> "qb"), col("id"), 4)
    assert(actual.select("id", "qa", "qb").except(
      expected.select("id", "qa", "qb")).isEmpty)
  }

  test("no unpartitioned window appears in the physical plan") {
    import org.apache.spark.sql.execution.window.WindowExec
    val df = fixture(500)
    val exec = GlobalRank.withNtile(df, col("m"), col("id"), "q", 4)
      .queryExecution.executedPlan
    // every Window must be PARTITIONED (by the range bucket) — an empty
    // partition spec is the single-partition global sort this operator
    // exists to eliminate
    val unpartitioned = graft.plans.PlanSignature.nodes(exec)
      .collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
    assert(unpartitioned.isEmpty)
  }
}
