package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.expressions.VectorDotProduct
import graft.functions.VectorFunctions

/** VectorizeDotFold rewrites the declarative aggregate(zip_with(...))
  * dot fold into the codegen'd VectorDotProduct, and ONLY that exact
  * shape — variations must pass through untouched. (Value equivalence
  * of the two forms is property-tested in VectorExpressionsSpec; this
  * spec covers the rewrite itself.)
  */
class VectorizeDotFoldSpec extends AnyFunSuite with SparkSuite {

  private def embeddings = {
    graft.expressions.VectorExpressions.register(spark)
    graft.Tables(spark, sf0001, "embeddings")
  }

  private def countDots(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Int = {
    var n = 0
    plan.transformAllExpressions {
      case v: VectorDotProduct => n += 1; v
    }
    n
  }

  test("the declarative dot fold is rewritten to VectorDotProduct") {
    val df = embeddings.select(
      VectorFunctions.dotFold(col("embedding"), col("embedding")).as("d"))
    val rewritten = VectorizeDotFold(df.queryExecution.analyzed)
    assert(countDots(df.queryExecution.analyzed) == 0)
    assert(countDots(rewritten) == 1, rewritten.treeString)
  }

  test("non-matching folds pass through untouched") {
    // subtraction instead of multiply: not a dot product
    val sub = embeddings.select(
      aggregate(
        zip_with(col("embedding"), col("embedding"),
          (x, y) => x.cast("double") - y.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("d"))
    assert(countDots(VectorizeDotFold(sub.queryExecution.analyzed)) == 0)
    // different zero: a biased fold, must not rewrite
    val biased = embeddings.select(
      aggregate(
        zip_with(col("embedding"), col("embedding"),
          (x, y) => x.cast("double") * y.cast("double")),
        lit(1.0), (acc, v) => acc + v).as("d"))
    assert(countDots(VectorizeDotFold(biased.queryExecution.analyzed)) == 0)
  }

  test("rewritten plan evaluates identically to the declarative form") {
    // end-to-end: run both the interpreted fold and the expression the
    // rule substitutes; bitwise-equal doubles on every row
    val a = embeddings.select(col("vec_id"),
        VectorFunctions.dotFold(col("embedding"), col("embedding")).as("d"))
      .orderBy("vec_id").collect()
    val b = embeddings.select(col("vec_id"),
        VectorFunctions.dotD(col("embedding"), col("embedding")).as("d"))
      .orderBy("vec_id").collect()
    assert(a.length == b.length && a.length > 0)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getLong(0) == y.getLong(0))
      assert(java.lang.Double.doubleToLongBits(x.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(y.getDouble(1)))
    }
  }
}
