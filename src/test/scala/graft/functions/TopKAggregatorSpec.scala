package graft.functions

import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkSuite}
import graft.plans.PlanSignature

/** TopKAggregator: the bounded-buffer property (never more than k
  * entries, so partial aggregation caps the shuffle), equivalence with
  * the window-row_number formulation it replaces, and the plan shape —
  * a PARTIAL ObjectHashAggregate below the exchange.
  */
class TopKAggregatorSpec extends AnyFunSuite with SparkSuite {

  private val agg = new TopKAggregator(3)

  test("reduce keeps the buffer bounded and ordered; cheap below-bar path") {
    val full = Seq(ScoredId(9, 1), ScoredId(8, 2), ScoredId(7, 3))
    // below the bar on a full buffer: identical object back (no sort)
    assert(agg.reduce(full, ScoredId(1, 9)) eq full)
    // above the bar: displaces the minimum
    assert(agg.reduce(full, ScoredId(8.5, 4)) ==
      Seq(ScoredId(9, 1), ScoredId(8.5, 4), ScoredId(8, 2)))
    // ties broken by id ascending
    assert(agg.reduce(Seq(ScoredId(9, 5)), ScoredId(9, 2)) ==
      Seq(ScoredId(9, 2), ScoredId(9, 5)))
  }

  test("merge truncates to k with the same total order") {
    val a = Seq(ScoredId(9, 1), ScoredId(5, 2))
    val b = Seq(ScoredId(8, 3), ScoredId(6, 4), ScoredId(4, 5))
    assert(agg.merge(a, b) ==
      Seq(ScoredId(9, 1), ScoredId(8, 3), ScoredId(6, 4)))
  }

  test("q_topk_agg equals the window-row_number formulation") {
    val orders = graft.Tables(spark, sf0001, "orders")
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val expected = orders
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select("o_custkey", "rnk", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rnk")
      .collect().toSeq
    val actual = SparkEntry.queries("q_topk_agg")(spark, sf0001)
      .collect().toSeq
    assert(actual == expected)
  }

  test("partial aggregation runs below the shuffle (map-side top-k)") {
    import org.apache.spark.sql.catalyst.expressions.aggregate.Partial
    val plan = SparkEntry.queries("q_topk_agg")(spark, sf0001)
      .queryExecution.executedPlan
    // the aggregate below an exchange must be PARTIAL-mode — a
    // Complete-mode aggregate sitting above the hash exchange (losing
    // the k-rows-per-group shuffle cap) also puts an ObjectHashAggregate
    // inside the output-sort exchange's subtree, so mode is the signal
    val hasPartialBelowShuffle = PlanSignature.nodes(plan).exists {
      case e: ShuffleExchangeLike =>
        PlanSignature.nodes(e.child).exists {
          case agg: ObjectHashAggregateExec =>
            agg.aggregateExpressions.nonEmpty &&
              agg.aggregateExpressions.forall(_.mode == Partial)
          case _ => false
        }
      case _ => false
    }
    assert(hasPartialBelowShuffle,
      s"no Partial-mode ObjectHashAggregate below an exchange:\n$plan")
  }
}
