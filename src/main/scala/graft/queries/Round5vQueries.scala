package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoinOps

/** Round-5v batch: queries served by the NATIVE custom operators —
  * the custom-LogicalPlan/SparkStrategy/SparkPlan stack, driven
  * through the DuckDB oracle gate like every declarative query.
  *
  *  - q_asof_native: the as-of attribution query executed by
  *    AsOfJoinExec (per-partition merge) instead of the union+window
  *    rewrite — same oracle as q_asof_join (DuckDB's native ASOF LEFT
  *    JOIN), so the custom operator is held to the same cross-engine
  *    bar as the declarative plans.
  */
object Round5vQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    graft.Tables(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_asof_native" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .withColumn("us", unix_micros(col("ts")))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"),
          col("us").as("click_us"), col("value").as("click_value"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("event_id").as("p_id"),
          col("us").as("p_us"), col("value").as("p_value"))
      AsOfJoinOps.asofJoin(clicks, purchases,
          leftKeys = Seq("user_id"), rightKeys = Seq("p_user"),
          leftTime = "click_us", rightTime = "p_us",
          rightTieBreak = Seq("p_id"))
        .select(col("user_id"), col("event_id"), col("click_us"),
          col("click_value"),
          col("p_value").as("last_purchase_value"),
          col("p_us").as("last_purchase_us"))
        .orderBy("user_id", "event_id")
    }),
  )

  val oracle: Map[String, String] = Map(

    // identical to q_asof_join's oracle: DuckDB's native ASOF LEFT
    // JOIN is the independent implementation both operators must match
    "q_asof_native" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type,
        |    value
        |  FROM events
        |),
        |clicks AS (SELECT * FROM e WHERE event_type = 'click'),
        |purch  AS (SELECT * FROM e WHERE event_type = 'purchase')
        |SELECT c.user_id, c.event_id, c.us AS click_us,
        |  c.value AS click_value,
        |  p.value AS last_purchase_value,
        |  p.us AS last_purchase_us
        |FROM clicks c ASOF LEFT JOIN purch p
        |  ON c.user_id = p.user_id AND c.us >= p.us
        |ORDER BY c.user_id, c.event_id""".stripMargin,
  )
}
