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

  test("ragged and null-element arrays yield NULL in both forms") {
    import spark.implicits._
    graft.expressions.VectorExpressions.register(spark)
    // (ragged lengths, null element, clean pair) — the declarative fold
    // returns NULL for the first two (zip_with null padding propagates);
    // VectorDotProduct must match or the rewrite changes results
    val df = Seq(
      (1L, Seq[Option[Float]](Some(1f), Some(2f)),
        Seq[Option[Float]](Some(1f))),
      (2L, Seq[Option[Float]](Some(1f), None),
        Seq[Option[Float]](Some(1f), Some(2f))),
      (3L, Seq[Option[Float]](Some(2f), Some(3f)),
        Seq[Option[Float]](Some(4f), Some(5f)))
    ).toDF("id", "a", "b")
    val out = df.select(col("id"),
        VectorFunctions.dotFold(col("a"), col("b")).as("fold"),
        VectorFunctions.dotD(col("a"), col("b")).as("fast"))
      .orderBy("id").collect()
    out.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2),
        s"null disagreement on id=${r.getLong(0)}: $r")
      if (!r.isNullAt(1)) assert(r.getDouble(1) == r.getDouble(2))
    }
    assert(out(0).isNullAt(1) && out(1).isNullAt(1) && !out(2).isNullAt(1))
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
