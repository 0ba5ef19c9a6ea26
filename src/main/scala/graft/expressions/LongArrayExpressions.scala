package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Primitive sorted-merge set operations over ARRAY<BIGINT> — the
  * adjacency-list intersections of the graph queries.
  *
  * Spark's `array_intersect` builds a boxed OpenHashSet PER ROW; over
  * the 1.2M oriented co-purchase edges each carrying O(sqrt m)-bounded
  * neighbor lists that allocation dominates the triangle queries'
  * profile (graph_triangles / q_local_clustering: ~70-120 s of task CPU
  * at sf0.1). Inputs here are produced with sort_array(collect_list(..))
  * and are duplicate-free by construction (distinct oriented edges), so
  * a two-pointer merge over primitive longs — zero allocation for the
  * size form, one exact-sized long[] for the array form — computes the
  * same set. Both are codegen'd so they stay inside the enclosing
  * WholeStageCodegen span.
  */
object LongArrayExpressions {

  def register(s: SparkSession): Unit = {
    Registration.tempFn(s, "graft_lsorted_intersect_size",
      exprs => LongSortedIntersectSize(exprs(0), exprs(1)))
    Registration.tempFn(s, "graft_lsorted_intersect",
      exprs => LongSortedIntersect(exprs(0), exprs(1)))
  }

  private[expressions] def checkLongArrays(
      prettyName: String, exprs: Seq[Expression]): TypeCheckResult = {
    val ok = exprs.forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments")
  }
}

/** |a ∩ b| for two SORTED duplicate-free long arrays. */
case class LongSortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    LongArrayExpressions.checkLongArrays(prettyName, Seq(left, right))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xa = a.asInstanceOf[ArrayData]
    val xb = b.asInstanceOf[ArrayData]
    val na = xa.numElements()
    val nb = xb.numElements()
    var i = 0
    var j = 0
    var count = 0
    while (i < na && j < nb) {
      val va = xa.getLong(i)
      val vb = xb.getLong(j)
      if (va == vb) { count += 1; i += 1; j += 1 }
      else if (va < vb) i += 1
      else j += 1
    }
    count
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val cnt = ctx.freshName("cnt")
      val va = ctx.freshName("va")
      val vb = ctx.freshName("vb")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $i = 0;
         |int $j = 0;
         |int $cnt = 0;
         |while ($i < $na && $j < $nb) {
         |  long $va = $a.getLong($i);
         |  long $vb = $b.getLong($j);
         |  if ($va == $vb) { $cnt++; $i++; $j++; }
         |  else if ($va < $vb) { $i++; }
         |  else { $j++; }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** a ∩ b (sorted ascending) for two SORTED duplicate-free long arrays. */
case class LongSortedIntersect(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    LongArrayExpressions.checkLongArrays(prettyName, Seq(left, right))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xa = a.asInstanceOf[ArrayData]
    val xb = b.asInstanceOf[ArrayData]
    val na = xa.numElements()
    val nb = xb.numElements()
    val buf = new Array[Long](math.min(na, nb))
    var i = 0
    var j = 0
    var k = 0
    while (i < na && j < nb) {
      val va = xa.getLong(i)
      val vb = xb.getLong(j)
      if (va == vb) { buf(k) = va; k += 1; i += 1; j += 1 }
      else if (va < vb) i += 1
      else j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(buf, k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val va = ctx.freshName("va")
      val vb = ctx.freshName("vb")
      val buf = ctx.freshName("buf")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |long[] $buf = new long[$na < $nb ? $na : $nb];
         |int $i = 0;
         |int $j = 0;
         |int $k = 0;
         |while ($i < $na && $j < $nb) {
         |  long $va = $a.getLong($i);
         |  long $vb = $b.getLong($j);
         |  if ($va == $vb) { $buf[$k] = $va; $k++; $i++; $j++; }
         |  else if ($va < $vb) { $i++; }
         |  else { $j++; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($buf, $k));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}
