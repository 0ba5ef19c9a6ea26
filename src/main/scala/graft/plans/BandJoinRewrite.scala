package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, ByteType, IntegerType, LongType, ShortType}

/** Optimizer rule: keyless BAND joins get the bucket-equi-join
  * decomposition automatically.
  *
  * A user who writes the natural formulation
  *
  *   a.join(b, abs($"a.ts" - $"b.ts") <= W)        // no equi-keys
  *
  * gets a BroadcastNestedLoopJoin from stock Spark — an O(|a|·|b|)
  * comparison count that is fine at test scale and fatal at 100 TB (the
  * classic range-join trap; see `q_bucketed_range_join` for the measured
  * hand-written decomposition this rule mechanizes, r9 verdict #2). The
  * rewrite:
  *
  *   1. quantize both sides by the band width W (floor division, so
  *      negative timestamps bucket correctly),
  *   2. explode ONE side to its {b-1, b, b+1} bucket neighborhood
  *      (|x-y| <= W implies the buckets differ by at most 1, so every
  *      qualifying pair meets on exactly one bucket key — no dedup
  *      needed),
  *   3. join as a plain HASH join on the bucket key,
  *   4. keep the original predicate as a residual filter.
  *
  * Output rows are identical to the naive plan's (each qualifying pair
  * produced exactly once; a NULL timestamp buckets to NULL, never
  * matches the equi-key, and is dropped — exactly as the NULL band
  * predicate dropped it before).
  *
  * The match is deliberately conservative, mirroring VectorizeDotFold's
  * exactness discipline:
  *  - INNER join only (outer variants change row preservation under the
  *    explode),
  *  - exactly one `abs(x - y) <= L` / `abs(x - y) < L` conjunct with a
  *    positive integral literal L, x and y integral columns from
  *    opposite sides,
  *  - NO equi-join conjunct (if one exists Spark already hash-joins on
  *    it with the band as residual — and the guard doubles as the
  *    idempotence check, because the rewritten join HAS an equi-key),
  *  - every other conjunct is kept in the residual untouched.
  */
object BandJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private def isIntegral(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def litLong(v: Any): Long = v match {
    case b: Byte => b.toLong
    case s: Short => s.toLong
    case i: Int => i.toLong
    case l: Long => l
  }

  /** abs(x - y) <= W (or < W), W a positive integral literal — returns
    * (x, y, W as an inclusive bound).
    */
  private object BandPredicate {
    def unapply(e: Expression): Option[(Expression, Expression, Long)] = e match {
      case LessThanOrEqual(Abs(Subtract(x, y, _), _), Literal(w, t))
          if isIntegral(x) && isIntegral(y) &&
            Seq(ByteType, ShortType, IntegerType, LongType).contains(t) =>
        val wv = litLong(w)
        if (wv > 0) Some((x, y, wv)) else None
      case LessThan(Abs(Subtract(x, y, _), _), Literal(w, t))
          if isIntegral(x) && isIntegral(y) &&
            Seq(ByteType, ShortType, IntegerType, LongType).contains(t) =>
        val wv = litLong(w)
        // |d| < W over integers is |d| <= W-1
        if (wv > 1) Some((x, y, wv - 1)) else None
      case _ => None
    }
  }

  /** Equi-conjunct between the two sides — present means Spark already
    * has a hash-join key (and means WE already rewrote this join).
    */
  private def isCrossEqui(e: Expression, l: LogicalPlan, r: LogicalPlan): Boolean = {
    def sided(a: Expression, b: Expression): Boolean =
      (a.references.subsetOf(l.outputSet) && b.references.subsetOf(r.outputSet) ||
        a.references.subsetOf(r.outputSet) && b.references.subsetOf(l.outputSet)) &&
        a.references.nonEmpty && b.references.nonEmpty
    e match {
      case EqualTo(a, b) => sided(a, b)
      case EqualNullSafe(a, b) => sided(a, b)
      case _ => false
    }
  }

  /** Floor division of an integral expression by a positive constant —
    * correct for negative values, unlike `div`'s truncation toward zero
    * (x - pmod(x, w) is the floor multiple; LEGACY eval mode because the
    * arithmetic cannot overflow for w > 0 and must not throw under ANSI).
    */
  private def floorBucket(x: Expression, w: Long): Expression = {
    val lx = if (x.dataType == LongType) x else Cast(x, LongType)
    val wl = Literal(w, LongType)
    IntegralDivide(
      Subtract(lx, Pmod(lx, wl, EvalMode.LEGACY), EvalMode.LEGACY),
      wl, EvalMode.LEGACY)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val bands = conjuncts.collect { case b @ BandPredicate(x, y, w) => (b, x, y, w) }
      if (bands.size != 1 || conjuncts.exists(isCrossEqui(_, left, right))) j
      else {
        val (_, x, y, w) = bands.head
        // orient: which band argument comes from which side?
        val oriented =
          if (x.references.nonEmpty && y.references.nonEmpty &&
            x.references.subsetOf(left.outputSet) &&
            y.references.subsetOf(right.outputSet)) Some((x, y))
          else if (x.references.nonEmpty && y.references.nonEmpty &&
            y.references.subsetOf(left.outputSet) &&
            x.references.subsetOf(right.outputSet)) Some((y, x))
          else None
        oriented match {
          case None => j
          case Some((lx, rx)) =>
            val b = floorBucket(lx, w)
            val one = Literal(1L, LongType)
            val arr = CreateArray(Seq(
              Subtract(b, one, EvalMode.LEGACY), b,
              Add(b, one, EvalMode.LEGACY)))
            val bkAttr = AttributeReference("__graft_band_bk",
              LongType, nullable = arr.dataType.asInstanceOf[ArrayType].containsNull)()
            val leftGen = Generate(Explode(arr), unrequiredChildIndex = Nil,
              outer = false, qualifier = None,
              generatorOutput = Seq(bkAttr), child = left)
            val rAlias = Alias(floorBucket(rx, w), "__graft_band_bk_r")()
            val rightProj = Project(right.output :+ rAlias, right)
            val newCond = And(EqualTo(bkAttr, rAlias.toAttribute), cond)
            val rewritten = Project(j.output,
              Join(leftGen, rightProj, Inner, Some(newCond), hint))
            logInfo(s"BandJoinRewrite: decomposed keyless band join " +
              s"(width $w) into a +/-1-bucket equi-join")
            rewritten
        }
      }
  }
}
