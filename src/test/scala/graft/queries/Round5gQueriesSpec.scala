package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Semantic invariants for the round-5g graph/sketch/SQL-sugar batch at
  * sf0.001 (exact values are covered by the DuckDB oracle gate).
  */
class Round5gQueriesSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    Round5gQueries.queries(name)(spark, sf0001)

  test("graph_triangles: census counts are consistent") {
    val r = run("graph_triangles").collect().head
    val (nodes, edges, wedges, tris) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nodes > 0 && edges > 0)
    // an undirected simple graph: e <= C(n,2); every triangle closes a
    // wedge and each triangle contains exactly 3 wedges
    assert(edges <= nodes * (nodes - 1) / 2)
    assert(tris * 3 <= wedges)
    assert(r.getDouble(4) == tris * 3.0 / wedges)
  }

  test("graph_triangles: degree-oriented count equals brute force") {
    // independent brute force at sf0.001: id-ordered triple join
    val li = graft.Tables(spark, sf0001, "lineitem")
      .select("l_orderkey", "l_partkey")
    val e = li.as("x").join(li.as("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_partkey") < col("y.l_partkey"))
      .select(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val nbrs = e.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val brute = e.toSeq.map { case (a, b) =>
      (nbrs.getOrElse(a, Set.empty) & nbrs.getOrElse(b, Set.empty)).size.toLong
    }.sum
    assert(run("graph_triangles").collect().head.getLong(3) == brute)
  }

  test("q_kmv_union: union kth bounds and estimate algebra hold") {
    val r = run("q_kmv_union").collect().head
    val (kc, kp, ku) = (r.getLong(0), r.getLong(1), r.getLong(2))
    // the union sketch's kth min can only be <= either input's kth min
    assert(ku <= kc && ku <= kp)
    assert(r.getDouble(5) >= r.getDouble(3) - 1e-9) // est_union >= est_click
    assert(r.getDouble(6) ==
      r.getDouble(3) + r.getDouble(4) - r.getDouble(5))
    assert(r.getLong(7) > 0) // exact_union present
  }

  test("q_distinct_on: one row per user, genuinely the latest") {
    val rows = run("q_distinct_on").collect()
    val users = rows.map(_.getLong(0))
    assert(users.distinct.length == users.length)
    val maxUs = graft.Tables(spark, sf0001, "events")
      .groupBy("user_id").agg(max(unix_micros(col("ts"))).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(4) == maxUs(r.getLong(0))))
  }

  test("q_mode: the mode is the max count; tie-break is minimal") {
    val rows = run("q_mode").collect()
    assert(rows.nonEmpty)
    val counts = graft.Tables(spark, sf0001, "lineitem")
      .groupBy("l_returnflag", "l_quantity").count().collect()
      .groupBy(_.getString(0))
    rows.foreach { r =>
      val flag = r.getString(0)
      val byQty = counts(flag).map(x => x.getDouble(1) -> x.getLong(2))
      val best = byQty.map(_._2).max
      assert(r.getLong(2) == best)
      // among max-count values, ours is the smallest
      assert(r.getDouble(1) == byQty.filter(_._2 == best).map(_._1).min)
      assert(r.getLong(3) == byQty.length.toLong)
    }
  }

  test("q_group_by_all equals the explicit group-by form") {
    val sugar = run("q_group_by_all").collect()
    val explicit = graft.Tables(spark, sf0001, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"),
        year(col("l_shipdate")).as("yr"))
      .agg(count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus", "yr")
      .collect()
    assert(sugar.length == explicit.length)
    sugar.zip(explicit).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0) &&
        a.getString(1) == b.getString(1) &&
        a.getInt(2) == b.getInt(2) && a.getLong(3) == b.getLong(3))
    }
  }
}
