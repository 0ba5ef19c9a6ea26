package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Round-3 third batch: the remaining classic TPC-H query shapes
  * expressible on this star schema — Q6 (banded-predicate scan agg),
  * Q7 (nation-pair volume), Q8 (market share ratio), Q9 (profit by
  * nation-year), Q13 (customer order-count distribution), Q15 (top
  * supplier by max revenue), Q17 (small-quantity avg subquery, made
  * exact), Q21 (waiting-supplier double-correlation). Q2/Q11/Q20 need
  * the partsupp table, which the synthetic schema does not ship, and
  * are out of scope rather than faked.
  *
  * Exactness: all money aggregates run in DECIMAL; FP appears only in
  * final mirrored divisions/casts. Q17's `qty < 0.2·avg(qty)` is
  * rewritten to the division-free integer-exact `5·n·qty < Σqty`, so
  * the correlated threshold has NO floating-point at all.
  *
  * Scale posture: dimensions (supplier/customer/nation/region/part)
  * broadcast explicitly; the only data-sized shuffles are the
  * lineitem⋈orders equi-joins and the final group-bys, all
  * partial-aggregated map-side.
  */
object Round3cQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  private val dec = DecimalType(18, 2)

  /** l_extendedprice * (1 - l_discount) in exact decimals. */
  private def volume: Column =
    col("l_extendedprice").cast(DecimalType(12, 2)) *
      (lit(1).cast(DecimalType(12, 2)) -
        col("l_discount").cast(DecimalType(4, 2)))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TPC-H Q6 shape: single-scan forecast-revenue aggregate under a
    // date window + discount band + quantity cap. Every predicate
    // pushes to the parquet scan; the aggregate is one partial+final
    // pair with a single decimal sum crossing the exchange.
    "q_tpch_q6" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount") >= 0.045 && col("l_discount") <= 0.075 &&
          col("l_quantity") < 24)
        .agg(
          sum(col("l_extendedprice").cast(DecimalType(12, 2)) *
            col("l_discount").cast(DecimalType(4, 2)))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))),

    // TPC-H Q7 shape: shipping volume between every distinct nation
    // pair by ship year. supplier/customer/nation broadcast; the
    // lineitem⋈orders join is the only data shuffle.
    "q_tpch_q7" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val ord = t(s, dir, "orders")
      val sup = broadcast(t(s, dir, "supplier"))
      val cust = broadcast(t(s, dir, "customer"))
      val n1 = broadcast(t(s, dir, "nation")
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
      val n2 = broadcast(t(s, dir, "nation")
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation")))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(n1, col("s_nationkey") === col("s_nk"))
        .join(n2, col("c_nationkey") === col("c_nk"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(sum(volume).cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // TPC-H Q8 shape: one nation's market share inside one region per
    // order year — a ratio of two exact decimal sums with a single
    // mirrored double division.
    "q_tpch_q8" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val ord = t(s, dir, "orders")
      val cust = broadcast(t(s, dir, "customer"))
      val nat = broadcast(t(s, dir, "nation"))
      val reg = broadcast(t(s, dir, "region")
        .filter(col("r_name") === "ASIA"))
      val sup = broadcast(t(s, dir, "supplier"))
      val supNat = broadcast(t(s, dir, "nation")
        .select(col("n_nationkey").as("sn_key"),
          col("n_name").as("supp_nation")))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(nat, col("c_nationkey") === col("n_nationkey"))
        .join(reg, col("n_regionkey") === col("r_regionkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(supNat, col("s_nationkey") === col("sn_key"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_5", volume)
            .otherwise(lit(0).cast(DecimalType(17, 4)))).as("nat_vol"),
          sum(volume).as("all_vol"))
        .select(col("o_year"),
          (col("nat_vol").cast("double") / col("all_vol").cast("double"))
            .as("mkt_share"))
        .orderBy("o_year")
    }),

    // TPC-H Q9 shape: profit by supplier nation and order year. The
    // schema has no partsupp, so supply cost is the exact surrogate
    // 0.5·p_retailprice (a decimal product, not a lossy division) —
    // the aggregation/join shape is Q9's, with part and supplier
    // broadcast and one lineitem⋈orders shuffle.
    "q_tpch_q9" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val ord = t(s, dir, "orders")
      val part = broadcast(t(s, dir, "part"))
      val sup = broadcast(t(s, dir, "supplier"))
      val nat = broadcast(t(s, dir, "nation"))
      val cost = col("p_retailprice").cast(DecimalType(12, 2)) *
        lit("0.5").cast(DecimalType(2, 1))
      li.join(part, col("l_partkey") === col("p_partkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(nat, col("s_nationkey") === col("n_nationkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).as("o_year"))
        .agg(sum(volume -
            col("l_quantity").cast(DecimalType(9, 2)) * cost)
          .cast("double").as("profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    // TPC-H Q13 shape: distribution of per-customer order counts, with
    // the order set filtered inside the OUTER join condition (customers
    // with no qualifying orders count as 0 — an inner join would lose
    // them).
    "q_tpch_q13" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderpriority") =!= "1-URGENT")
      cust.join(ord, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // TPC-H Q15 shape: supplier(s) achieving the maximum quarterly
    // revenue. The max and the equality test both run on EXACT decimal
    // revenue (a double max could strand the true winner); the cast to
    // double happens only on output.
    "q_tpch_q15" -> ((s, dir) => {
      val rev = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum(volume).as("total_rev"))
      val top = rev.agg(max(col("total_rev")).as("max_rev"))
      rev.join(broadcast(top), col("total_rev") === col("max_rev"))
        .join(broadcast(t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("total_rev").cast("double").as("total_revenue"))
        .orderBy("s_suppkey")
    }),

    // TPC-H Q17 shape: revenue lost to small-quantity orders of one
    // brand. The correlated `qty < 0.2·avg(qty per part)` threshold is
    // rewritten division-free as `5·n·qty < Σqty` — integer/decimal
    // exact, so the predicate cannot flake on FP rounding. Brand parts
    // broadcast twice (filter + stats join); per-part stats aggregate
    // only the brand's lineitems.
    "q_tpch_q17" -> ((s, dir) => {
      val brandParts = broadcast(t(s, dir, "part")
        .filter(col("p_brand") === "Brand#1")
        .select("p_partkey"))
      val li = t(s, dir, "lineitem")
        .join(brandParts, col("l_partkey") === col("p_partkey"))
      val stats = li.groupBy(col("l_partkey").as("sp_key"))
        .agg(count(lit(1)).as("n_li"),
          sum(col("l_quantity").cast(DecimalType(9, 2))).as("sum_qty"))
      li.join(broadcast(stats), col("l_partkey") === col("sp_key"))
        .filter(lit(5) * col("n_li") *
          col("l_quantity").cast(DecimalType(9, 2)) < col("sum_qty"))
        .agg((sum(col("l_extendedprice").cast(DecimalType(12, 2)))
            .cast("double") / lit(7.0)).as("avg_yearly"),
          count(lit(1)).as("n_small"))
    }),

    // Runtime semi-join reduction: a bloom filter over the urgent
    // orders' keys (built once, driver-side — the same one aggregate
    // job AQE's runtime filters run) prunes the lineitem scan BEFORE
    // its shuffle through the codegen'd graft_bloom_might_contain
    // probe. At 100 TB: ~1 MB of bits to every task instead of
    // shuffling the ~80% of fact rows that cannot join. Results are
    // exactly the plain join's — no false negatives, and false
    // positives die in the real join — so the oracle is ordinary SQL.
    "q_bloom_join" -> ((s, dir) => {
      graft.expressions.BloomExpressions.register(s)
      val urgent = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      // stat.bloomFilter on an EMPTY frame returns a bloom whose bit
      // buffer is null (writeTo NPEs) — substitute an explicit empty
      // filter so the degenerate corpus prunes everything cleanly
      val bloom =
        if (urgent.isEmpty)
          org.apache.spark.util.sketch.BloomFilter.create(1000000L, 0.01)
        else urgent.stat.bloomFilter("o_orderkey",
          expectedNumItems = 1000000L, fpp = 0.01)
      val bytes = {
        val bos = new java.io.ByteArrayOutputStream()
        bloom.writeTo(bos)
        bos.toByteArray
      }
      val prunedLi = t(s, dir, "lineitem")
        .filter(call_function("graft_bloom_might_contain",
          col("l_orderkey"), lit(bytes)))
      prunedLi.join(urgent, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
          sum(col("l_extendedprice").cast(DecimalType(12, 2)))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
    }),

    // TPC-H Q21 shape: suppliers who kept multi-supplier orders
    // waiting — the only late supplier on an order with >1 suppliers
    // (late = shipped >90 days after the order date; the schema has no
    // commit/receipt dates). One aggregation per order captures
    // supplier count, late count AND the unique late supplier, so no
    // join-back over lineitem is needed at all.
    "q_tpch_q21" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val ord = t(s, dir, "orders")
      // two-level aggregate instead of two COUNT(DISTINCT ...): the
      // Expand-based distinct rewrite would triple the fact rows through
      // the shuffle; collapsing to (order, supplier) first, then
      // counting plain rows, moves each combination exactly once
      val perSupp = li
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .withColumn("late",
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(expr("bool_or(late)").as("supp_late"))
      val perOrder = perSupp
        .groupBy("l_orderkey")
        .agg(
          count(lit(1)).as("n_supp"),
          sum(when(col("supp_late"), 1L).otherwise(0L)).as("n_late"),
          max(when(col("supp_late"), col("l_suppkey"))).as("late_supp"))
      perOrder
        .filter(col("n_supp") > 1 && col("n_late") === 1)
        .groupBy("late_supp")
        .agg(count(lit(1)).as("numwait"))
        .join(broadcast(t(s, dir, "supplier")),
          col("late_supp") === col("s_suppkey"))
        .select(col("s_name"), col("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    })
  )

  // ---------------------------------------------------------------- oracle

  private val volSql =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * " +
      "(CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(4,2)))"

  val oracle: Map[String, String] = Map(

    "q_tpch_q6" ->
      """SELECT
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.045 AND l_discount <= 0.075
        |  AND l_quantity < 24""".stripMargin,

    "q_tpch_q7" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  year(l_shipdate) AS l_year,
         |  CAST(sum($volSql) AS DOUBLE) AS revenue,
         |  count(*) AS n_lines
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE n1.n_name <> n2.n_name
         |GROUP BY 1, 2, 3
         |ORDER BY 1, 2, 3""".stripMargin,

    "q_tpch_q8" ->
      s"""WITH v AS (
         |  SELECT year(o_orderdate) AS o_year,
         |    sum(CASE WHEN sn.n_name = 'NATION_5' THEN $volSql
         |        ELSE CAST(0 AS DECIMAL(17,4)) END) AS nat_vol,
         |    sum($volSql) AS all_vol
         |  FROM lineitem
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation cn ON c_nationkey = cn.n_nationkey
         |  JOIN region ON cn.n_regionkey = r_regionkey
         |    AND r_name = 'ASIA'
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation sn ON s_nationkey = sn.n_nationkey
         |  GROUP BY 1
         |)
         |SELECT o_year,
         |  CAST(nat_vol AS DOUBLE) / CAST(all_vol AS DOUBLE) AS mkt_share
         |FROM v ORDER BY o_year""".stripMargin,

    "q_tpch_q9" ->
      s"""SELECT n_name AS nation, year(o_orderdate) AS o_year,
         |  CAST(sum($volSql
         |    - CAST(l_quantity AS DECIMAL(9,2))
         |      * (CAST(p_retailprice AS DECIMAL(12,2))
         |         * CAST(0.5 AS DECIMAL(2,1)))) AS DOUBLE) AS profit
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY 1, 2
         |ORDER BY nation, o_year DESC""".stripMargin,

    "q_tpch_q13" ->
      """WITH co AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer
        |  LEFT JOIN orders ON c_custkey = o_custkey
        |    AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey
        |)
        |SELECT c_count, count(*) AS custdist
        |FROM co GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q_tpch_q15" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey, sum($volSql) AS total_rev
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |    AND l_shipdate < TIMESTAMP '1996-04-01'
         |  GROUP BY l_suppkey
         |)
         |SELECT s_suppkey, s_name,
         |  CAST(total_rev AS DOUBLE) AS total_revenue
         |FROM rev JOIN supplier ON l_suppkey = s_suppkey
         |WHERE total_rev = (SELECT max(total_rev) FROM rev)
         |ORDER BY s_suppkey""".stripMargin,

    "q_tpch_q17" ->
      """WITH li AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#1'
        |),
        |stats AS (
        |  SELECT l_partkey AS sp_key, count(*) AS n_li,
        |    sum(CAST(l_quantity AS DECIMAL(9,2))) AS sum_qty
        |  FROM li GROUP BY 1
        |)
        |SELECT
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
        |    / 7.0 AS avg_yearly,
        |  count(*) AS n_small
        |FROM li JOIN stats ON l_partkey = sp_key
        |WHERE 5 * n_li * CAST(l_quantity AS DECIMAL(9,2)) < sum_qty""".stripMargin,

    "q_bloom_join" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
        |    AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY o_orderpriority""".stripMargin,

    "q_tpch_q21" ->
      """WITH per_order AS (
        |  SELECT l_orderkey,
        |    count(DISTINCT l_suppkey) AS n_supp,
        |    count(DISTINCT CASE WHEN
        |      l_shipdate > o_orderdate + INTERVAL 90 DAY
        |      THEN l_suppkey END) AS n_late,
        |    max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
        |      THEN l_suppkey END) AS late_supp
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY l_orderkey
        |)
        |SELECT s_name, count(*) AS numwait
        |FROM per_order JOIN supplier ON late_supp = s_suppkey
        |WHERE n_supp > 1 AND n_late = 1
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 20""".stripMargin
  )
}
