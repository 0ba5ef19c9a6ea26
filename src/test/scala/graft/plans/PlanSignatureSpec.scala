package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** The `bnlj` signature field (r11 verdict #1): a silent
  * BroadcastNestedLoopJoin FALLBACK — the quadratic shape
  * BandJoinRewrite exists to kill — must be VISIBLE to the plan-contract
  * gate, while the deliberate `crossJoin(broadcast(...))`
  * scalar/catalog-augmentation idiom (1-row aggregates, author-hinted
  * small frames) must not drown the signal. These cases pin both sides
  * of that line; the committed plan-contracts.tsv (all but three keys
  * frozen at bnlj=0) is what turns the count into a regression gate.
  */
class PlanSignatureSpec extends AnyFunSuite with SparkSuite {

  import scala.jdk.CollectionConverters._
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  private def df(name: String, n: Int): DataFrame =
    spark.createDataFrame(
      (0 until n).map(i => Row(i.toLong, (i * 7 % 50).toLong)).asJava,
      StructType(Seq(StructField(s"${name}_id", LongType, nullable = false),
        StructField(s"${name}_v", LongType, nullable = false))))

  private def bnljOf(d: DataFrame): Int = {
    val sig = PlanSignature.of(d)
    sig.split(" ").collectFirst {
      case f if f.startsWith("bnlj=") => f.stripPrefix("bnlj=").toInt
    }.get
  }

  // parquet-backed frames (LogicalRelation, no maxRows — like every real
  // query): a LOCAL relation would carry maxRows = data.length and read
  // as provably bounded, hiding exactly the fallback these cases pin
  private def pq(alias: String): DataFrame =
    graft.Tables(spark, sf0001, "nation")
      .select(col("n_nationkey").as(s"${alias}_id"),
        col("n_regionkey").as(s"${alias}_v"))

  test("an unhinted keyless inequality join COUNTS — the gate trips") {
    // a half-open band (one-sided inequality) is exactly what a
    // BandJoinRewrite regression or an unrecognized shape degrades to:
    // Spark falls back to BNLJ with a full table as the build side. A
    // contract frozen at bnlj=0 mismatches 'bnlj=1' and fails the sweep.
    val j = pq("a").join(pq("b"), col("a_v") <= col("b_v"))
    assert(bnljOf(j) == 1, PlanSignature.of(j))
  }

  test("a 1-row-aggregate crossJoin build does NOT count (maxRows bound)") {
    // the mirrored-IEEE-tree idiom: augment every row with a global
    // total. Catalyst proves the ungrouped aggregate is <= 1 row.
    val tot = df("b", 100).agg(sum(col("b_v")).as("t"))
    val j = df("a", 100).crossJoin(broadcast(tot))
    assert(bnljOf(j) == 0, PlanSignature.of(j))
  }

  test("an author-broadcast()-hinted catalog build does NOT count") {
    // grouped aggregate over a bounded domain: Catalyst cannot bound it,
    // but the explicit broadcast() hint is the author's reviewed small-n
    // declaration — the signature must not flag what a human already
    // adjudicated at the call site.
    val cat = pq("b").groupBy(col("b_v") % 5).agg(count(lit(1)))
      .select(col("count(1)").as("c"))
    val j = pq("a").join(broadcast(cat), col("a_v") <= col("c"))
    assert(bnljOf(j) == 0, PlanSignature.of(j))
  }

  test("an UNHINTED grouped-aggregate build still counts (no proof, no hint)") {
    val cat = pq("b").groupBy(col("b_v") % 5).agg(count(lit(1)))
      .select(col("count(1)").as("c"))
    val j = pq("a").join(cat, col("a_v") <= col("c"))
    assert(bnljOf(j) == 1, PlanSignature.of(j))
  }
}
