package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-12 batches at sf0.001 — exact
  * values ride the DuckDB oracle gate at sf0.01/sf0.001; these pin the
  * properties a hash compare can't express.
  */
class Round12QueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(m: Map[String, (org.apache.spark.sql.SparkSession,
    String) => org.apache.spark.sql.DataFrame], name: String) =
    m(name)(spark, sf0001)

  // ---- 12a: TimestampNTZ band joins ----------------------------------

  test("q_ntz_band_join_auto equals the same band on TimestampType " +
    "(cast TZ->NTZ is a micros identity under the pinned-UTC session)") {
    import org.apache.spark.sql.functions._
    val a = run(Round12aQueries.queries, "q_ntz_band_join_auto").collect()
    val e = graft.Tables(spark, sf0001, "events")
      .select(col("event_id"), col("event_type"), col("value"), col("ts"))
    val views = e.filter(col("event_type") === "view")
      .select(col("event_id").as("vid"), col("ts").as("v_ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("ts").as("p_ts"),
        col("value").as("p_value"))
    val b = views.join(purchases,
        abs(col("p_ts") - col("v_ts")) <= expr("INTERVAL '45' SECOND"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("vid")).as("n_views_matched"),
        countDistinct(col("pid")).as("n_purchases_matched"),
        sum(col("p_value").cast(org.apache.spark.sql.types
          .DecimalType(18, 2)))
          .cast("string").cast("double").as("sum_value"))
      .collect()
    assert(a.length == 1 && b.length == 1)
    assert(a.head == b.head)
  }

  test("NTZ band-join keys plan without a nested-loop join") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    for (k <- Seq("q_ntz_band_join_auto", "q_ntz_between_join_auto")) {
      val df = run(Round12aQueries.queries, k)
      val bad = graft.plans.PlanSignature.nodes(df.queryExecution.executedPlan)
        .exists {
          case _: BroadcastNestedLoopJoinExec | _: CartesianProductExec => true
          case _ => false
        }
      assert(!bad, s"$k planned a nested-loop join")
    }
  }
}
