package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 batch l: item-item co-occurrence — the market-basket
  * neighborhood model a retail/recommendation pipeline derives from the
  * order fact table (co-purchase support, cosine association, lift).
  * All association strengths are exact rationals of integer counts, so
  * every score is bitwise-identical across engines: cosine =
  * cooc / sqrt(na·nb) (IEEE sqrt and divide of exact integers are
  * correctly rounded everywhere), lift = (cooc·B) / (na·nb) with both
  * products < 2^53.
  *
  * Scale posture: the pair expansion is a per-basket self-join keyed on
  * the order — quadratic only in the BASKET size (bounded ~7 lines in
  * TPC-H-shaped data), never in the catalog or the order count; the
  * pair aggregate shuffles (p_a, p_b) keys with map-side combine, and
  * the per-item count table joins back via broadcast. Global top-N
  * selection is TakeOrderedAndProject (per-partition heaps), never a
  * single-partition window.
  *
  *  - q_item_cooc: distinct-item baskets -> within-order pairs
  *    (p_a < p_b) -> support counts; top-50 by (support, p_a, p_b).
  *  - q_item_cosine: support-weighted association cosine
  *    cooc / sqrt(na·nb) for pairs with support >= 2; top-30.
  *  - q_item_lift: pointwise lift (cooc·B)/(na·nb) vs independence
  *    for pairs with support >= 3; top-20 plus the exact integer
  *    numerator/denominator so the ranking is auditable.
  */
object Round10lQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    graft.Tables(s, dir, n)

  /** Per-order sorted distinct item arrays (r12, guide §2.3/§2.4): ONE
    * groupBy(order) with map-side partial collect_set replaces the old
    * distinct-rows frame — the downstream pair expansion then runs in
    * memory per basket instead of a per-order self-join (which shuffled
    * the membership table and sorted both sort-merge sides), and the
    * per-item counts come from exploding the same arrays. Basket sizes
    * are bounded (~7 lines in TPC-H-shaped data), so the expansion is
    * constant work per order.
    */
  private def baskets(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .groupBy("o").agg(sort_array(collect_set(col("p"))).as("ps"))

  /** Within-order part pairs (p_a < p_b) with support counts — the
    * arrays are sorted, so slice-after-i enumeration gives exactly the
    * p_a < p_b pair set of the old self-join.
    */
  private def pairs(b: DataFrame): DataFrame =
    b.select(explode(flatten(transform(col("ps"), (a, i) =>
        transform(slice(col("ps"), i + 2, size(col("ps"))), pb =>
          struct(a.as("p_a"), pb.as("p_b")))))).as("e"))
      .select(col("e.p_a").as("p_a"), col("e.p_b").as("p_b"))
      .groupBy("p_a", "p_b")
      .agg(count(lit(1)).as("cooc"))

  /** Per-part basket counts. */
  private def itemCounts(b: DataFrame): DataFrame =
    b.select(explode(col("ps")).as("p"))
      .groupBy(col("p")).agg(count(lit(1)).as("n"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_item_cooc" -> ((s, dir) => {
      pairs(baskets(s, dir))
        .orderBy(col("cooc").desc, col("p_a"), col("p_b"))
        .limit(50)
    }),

    "q_item_cosine" -> ((s, dir) => {
      val b = graft.CacheScope.retain(baskets(s, dir))
      val n = itemCounts(b)
      pairs(b).filter(col("cooc") >= 2)
        .join(broadcast(n.select(col("p").as("p_a"), col("n").as("n_a"))),
          Seq("p_a"))
        .join(broadcast(n.select(col("p").as("p_b"), col("n").as("n_b"))),
          Seq("p_b"))
        .withColumn("cosine", col("cooc").cast("double") /
          sqrt((col("n_a") * col("n_b")).cast("double")))
        .select("p_a", "p_b", "cooc", "n_a", "n_b", "cosine")
        .orderBy(col("cosine").desc, col("p_a"), col("p_b"))
        .limit(30)
    }),

    "q_item_lift" -> ((s, dir) => {
      val b = graft.CacheScope.retain(baskets(s, dir))
      val n = itemCounts(b)
      // one row per order in the grouped-sets frame, so the distinct
      // basket total is a plain count
      val totB = b.agg(count(lit(1)).as("b_total"))
      pairs(b).filter(col("cooc") >= 3)
        .join(broadcast(n.select(col("p").as("p_a"), col("n").as("n_a"))),
          Seq("p_a"))
        .join(broadcast(n.select(col("p").as("p_b"), col("n").as("n_b"))),
          Seq("p_b"))
        .crossJoin(broadcast(totB))
        // exact integer numerator/denominator (cooc·B ~ 1e8, na·nb ~ 1e8:
        // both far inside the 2^53 double-exact range), then ONE
        // correctly-rounded division — bitwise-equal across engines
        .withColumn("lift_num", col("cooc") * col("b_total"))
        .withColumn("lift_den", col("n_a") * col("n_b"))
        .withColumn("lift",
          col("lift_num").cast("double") / col("lift_den").cast("double"))
        .select("p_a", "p_b", "cooc", "lift_num", "lift_den", "lift")
        .orderBy(col("lift").desc, col("p_a"), col("p_b"))
        .limit(20)
    }))

  private val basketsSql =
    """baskets AS (
      |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
      |), pairs AS (
      |  SELECT a.p AS p_a, b.p AS p_b, CAST(COUNT(*) AS BIGINT) AS cooc
      |  FROM baskets a JOIN baskets b ON a.o = b.o AND a.p < b.p
      |  GROUP BY 1, 2
      |), items AS (
      |  SELECT p, CAST(COUNT(*) AS BIGINT) AS n FROM baskets GROUP BY 1
      |)""".stripMargin

  val oracle: Map[String, String] = Map(

    "q_item_cooc" ->
      s"""WITH $basketsSql
         |SELECT p_a, p_b, cooc FROM pairs
         |ORDER BY cooc DESC, p_a, p_b LIMIT 50""".stripMargin,

    "q_item_cosine" ->
      s"""WITH $basketsSql
         |SELECT p.p_b, p.p_a, p.cooc, na.n AS n_a, nb.n AS n_b,
         |  CAST(p.cooc AS DOUBLE) / sqrt(CAST(na.n * nb.n AS DOUBLE))
         |    AS cosine
         |FROM pairs p
         |JOIN items na ON na.p = p.p_a
         |JOIN items nb ON nb.p = p.p_b
         |WHERE p.cooc >= 2
         |ORDER BY cosine DESC, p.p_a, p.p_b LIMIT 30""".stripMargin,

    "q_item_lift" ->
      s"""WITH $basketsSql, tot AS (
         |  SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS b_total FROM baskets
         |)
         |SELECT p.p_b, p.p_a, p.cooc,
         |  p.cooc * t.b_total AS lift_num,
         |  na.n * nb.n AS lift_den,
         |  CAST(p.cooc * t.b_total AS DOUBLE)
         |    / CAST(na.n * nb.n AS DOUBLE) AS lift
         |FROM pairs p
         |JOIN items na ON na.p = p.p_a
         |JOIN items nb ON nb.p = p.p_b
         |CROSS JOIN tot t
         |WHERE p.cooc >= 3
         |ORDER BY lift DESC, p.p_a, p.p_b LIMIT 20""".stripMargin)
}
