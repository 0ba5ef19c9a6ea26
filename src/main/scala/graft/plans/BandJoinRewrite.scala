package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DateType, DayTimeIntervalType, DecimalType, IntegerType, LongType, ShortType, TimestampNTZType, TimestampType}

/** Reinterprets a TimestampNTZ value as its internal epoch-micros Long.
  * TimestampNTZType's physical representation IS micros since epoch of
  * the wall-clock reading (no zone), so this is a zero-cost identity —
  * unlike Cast to Long (whole seconds, lossy) or an NTZ→TZ cast (a
  * session-zone shift that is NOT constant across a DST boundary, which
  * would put in-band pairs in non-adjacent buckets = lost rows). Used
  * only inside [[BandJoinRewrite]]'s bucket-key construction; never
  * user-facing.
  */
private[plans] case class NtzMicros(child: Expression)
    extends UnaryExpression {
  // AbstractDataType/ExpectsInputTypes are private[sql]; check directly
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == TimestampNTZType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"$prettyName requires timestamp_ntz, got " +
        child.dataType.simpleString)
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any = v
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = defineCodeGen(ctx, ev, c => c)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

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
  * Two recognized shapes:
  *  - `abs(x - y) <= W` (and strict `<`, tightened to W-1) — the
  *    symmetric band;
  *  - an upper/lower bound PAIR on the same (x, y) — `x <= y + L2 AND
  *    x >= y - L1`, i.e. `x.between(y - L1, y + L2)` and its
  *    `x - y <= hi AND x - y >= lo` spellings — the asymmetric band
  *    [lo, hi]. The right side is shifted by lo and bucketed at width
  *    hi - lo, so `lx - (rx + lo)` lands in [0, width] and bucket ids
  *    differ by at most one.
  *
  * The match is deliberately conservative, mirroring VectorizeDotFold's
  * exactness discipline:
  *  - INNER join only (outer variants change row preservation under the
  *    explode),
  *  - exactly ONE band among the conjuncts (one abs conjunct or one
  *    bound pair; ambiguity bails out), x and y integral columns from
  *    opposite sides,
  *  - NO equi-join conjunct (if one exists Spark already hash-joins on
  *    it with the band as residual — and the guard doubles as the
  *    idempotence check, because the rewritten join HAS an equi-key),
  *  - every other conjunct is kept in the residual untouched.
  *
  * TEMPORAL bands (r10 verdict #1): the shape users actually write —
  * `abs(a.ts - b.ts) <= INTERVAL '60' SECOND`, or
  * `a.ts.between(b.ts - INTERVAL ..., b.ts + INTERVAL ...)` on raw
  * TimestampType/DateType columns — analyzes to SubtractTimestamps /
  * SubtractDates / TimestampAddInterval / DateAdd nodes compared
  * against DayTimeIntervalType literals (stored as Long MICROS). A
  * detection-only pre-pass maps each comparison conjunct into the
  * epoch-micros integral domain (UnixMicros for timestamps, UnixDate ×
  * 86 400 000 000 for dates — exact within Spark's supported
  * [0001, 9999] date range) and the existing integral machinery then
  * recognizes the band and builds the bucket keys from the normalized
  * Long expressions. The RESIDUAL stays the ORIGINAL temporal
  * predicate, so the rewrite cannot change semantics even where the
  * normalization is conservative; year-month intervals (variable
  * length) are deliberately not matched. TimestampNTZ (r11 verdict
  * #4) IS matched — it is the same Long-micros representation on the
  * wall-clock epoch ([[NtzMicros]]) — but a comparison mixing the
  * wall-clock and UTC epochs bails out (`mixesEpochs`).
  *
  * DECIMAL bands (`abs(a.price - b.price) <= 5.00` with a decimal
  * literal — the duplicate-payment / price-band join): a DecimalType is
  * a scaled integer, so operands map to UnscaledValue × 10^(S−s) at the
  * comparison's common scale S — exact integer arithmetic, gated to
  * Long-backed decimals (precision + rescale digits ≤ 18). The +/−
  * nodes are decomposed rather than wrapped whole, so the band patterns
  * still see `Subtract(x, y)` / `Add(b, Literal)`; decimal literals
  * fold to unscaled-Long literals inside the rule (the normalized tree
  * is transient — ConstantFolding never sees it). Same residual
  * guarantee as the temporal family.
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

  /** One linear bound on (a - b): `a - b <= limit` (upper) or
    * `a - b >= limit` (lower), recognized from the shapes users
    * actually write — `a - b <= L`, `a <= b + L`, `a <= b - L`,
    * `a.between(b - L1, b + L2)`'s two conjuncts — with strict
    * variants tightened by 1 (integer domains).
    */
  private object BoundPredicate {
    private def ok(a: Expression, b: Expression, t: Any): Boolean =
      isIntegral(a) && isIntegral(b) &&
        Seq(ByteType, ShortType, IntegerType, LongType).contains(t)
    def unapply(e: Expression): Option[(Expression, Expression, Boolean, Long)] =
      e match {
        case LessThanOrEqual(Subtract(a, b, _), Literal(v, t)) if ok(a, b, t) =>
          Some((a, b, true, litLong(v)))
        case LessThan(Subtract(a, b, _), Literal(v, t)) if ok(a, b, t) =>
          Some((a, b, true, litLong(v) - 1))
        case GreaterThanOrEqual(Subtract(a, b, _), Literal(v, t)) if ok(a, b, t) =>
          Some((a, b, false, litLong(v)))
        case GreaterThan(Subtract(a, b, _), Literal(v, t)) if ok(a, b, t) =>
          Some((a, b, false, litLong(v) + 1))
        case LessThanOrEqual(a, Add(b, Literal(v, t), _)) if ok(a, b, t) =>
          Some((a, b, true, litLong(v)))
        case LessThanOrEqual(a, Add(Literal(v, t), b, _)) if ok(a, b, t) =>
          Some((a, b, true, litLong(v)))
        case LessThanOrEqual(a, Subtract(b, Literal(v, t), _)) if ok(a, b, t) =>
          Some((a, b, true, -litLong(v)))
        case GreaterThanOrEqual(a, Add(b, Literal(v, t), _)) if ok(a, b, t) =>
          Some((a, b, false, litLong(v)))
        case GreaterThanOrEqual(a, Add(Literal(v, t), b, _)) if ok(a, b, t) =>
          Some((a, b, false, litLong(v)))
        case GreaterThanOrEqual(a, Subtract(b, Literal(v, t), _)) if ok(a, b, t) =>
          Some((a, b, false, -litLong(v)))
        case LessThan(a, Add(b, Literal(v, t), _)) if ok(a, b, t) =>
          Some((a, b, true, litLong(v) - 1))
        case LessThan(a, Add(Literal(v, t), b, _)) if ok(a, b, t) =>
          Some((a, b, true, litLong(v) - 1))
        case GreaterThan(a, Subtract(b, Literal(v, t), _)) if ok(a, b, t) =>
          Some((a, b, false, -litLong(v) + 1))
        // the two strict shapes the r11 table missed (r11 ADVICE):
        // `a < b - L` and `a > b + L` — tightened by 1 like their
        // mirrors. Wrapped tightenings at the Long extremes land
        // near +/-2^63 and are discarded by the 2^61 extreme-bounds
        // bail-out before any bucket arithmetic.
        case LessThan(a, Subtract(b, Literal(v, t), _)) if ok(a, b, t) =>
          Some((a, b, true, -litLong(v) - 1))
        case GreaterThan(a, Add(b, Literal(v, t), _)) if ok(a, b, t) =>
          Some((a, b, false, litLong(v) + 1))
        case GreaterThan(a, Add(Literal(v, t), b, _)) if ok(a, b, t) =>
          Some((a, b, false, litLong(v) + 1))
        case _ => None
      }
  }

  private val MicrosPerDay = 86400000000L

  /** A Timestamp/Date-typed expression, rewritten to epoch micros.
    * TimestampNTZ (r11 verdict #4) is the same Long-micros
    * representation as TimestampType, just wall-clock-epoch instead of
    * UTC-epoch; [[NtzMicros]] reinterprets it at zero cost. The two
    * epochs must never meet inside one comparison — `normalizeTemporal`
    * bails on any normalized tree mixing NtzMicros with
    * UnixMicros/UnixDate.
    */
  private def toMicros(e: Expression): Option[Expression] = e.dataType match {
    case TimestampType => Some(UnixMicros(e))
    case TimestampNTZType => Some(NtzMicros(e))
    case DateType => Some(Multiply(Cast(UnixDate(e), LongType),
      Literal(MicrosPerDay, LongType), EvalMode.LEGACY))
    case _ => None
  }

  /** One operand of a temporal comparison, mapped into the epoch-micros
    * integral domain the band machinery understands. Only shapes whose
    * micros value is EXACT are matched (day-time interval literals are
    * Long micros by representation; date ± int days is whole days).
    */
  private def microsOperand(e: Expression): Option[Expression] = e match {
    case Abs(inner, fail) => microsOperand(inner).map(Abs(_, fail))
    case Literal(v: Long, _: DayTimeIntervalType) => Some(Literal(v, LongType))
    // same-type operands only: a TZ−NTZ subtract (if analysis ever
    // admits one uncoerced) would difference UTC-epoch against
    // wall-clock-epoch micros — wrong buckets = lost rows
    case st: SubtractTimestamps if st.left.dataType == st.right.dataType =>
      for (a <- toMicros(st.left); b <- toMicros(st.right))
        yield Subtract(a, b, EvalMode.LEGACY)
    case sd: SubtractDates =>
      for (a <- toMicros(sd.left); b <- toMicros(sd.right))
        yield Subtract(a, b, EvalMode.LEGACY)
    case ta: TimestampAddInterval => ta.interval match {
      case Literal(v: Long, _: DayTimeIntervalType) =>
        toMicros(ta.start).map(m =>
          Add(m, Literal(v, LongType), EvalMode.LEGACY))
      case _ => None
    }
    // |days| gated so days × µs/day cannot wrap a Long (a wrapped
    // literal would bucket wrongly = lost rows)
    case da: DateAdd => da.days match {
      case Literal(n, t) if Seq(ByteType, ShortType, IntegerType).contains(t)
          && math.abs(litLong(n)) <= 100000000L =>
        toMicros(da.startDate).map(m =>
          Add(m, Literal(litLong(n) * MicrosPerDay, LongType), EvalMode.LEGACY))
      case _ => None
    }
    case ds: DateSub => ds.days match {
      case Literal(n, t) if Seq(ByteType, ShortType, IntegerType).contains(t)
          && math.abs(litLong(n)) <= 100000000L =>
        toMicros(ds.startDate).map(m =>
          Add(m, Literal(-litLong(n) * MicrosPerDay, LongType), EvalMode.LEGACY))
      case _ => None
    }
    case other => toMicros(other)
  }

  /** DECIMAL bands (`abs(a.price - b.price) <= 5.00`, price-band /
    * duplicate-payment joins): a DecimalType is a scaled integer, so an
    * operand of scale s maps to UnscaledValue(e) × 10^(S−s) at the
    * comparison's common scale S — exact integer arithmetic, gated so
    * the scaled unscaled value stays within 18 digits (Long-backed
    * Decimal; wider decimals bail out). Returns (expr, scale); the
    * caller rescales both sides to the common S.
    */
  private def decimalOperand(e: Expression): Option[(Expression, Int)] =
    e match {
      case Abs(inner, fail) =>
        decimalOperand(inner).map { case (x, s) => (Abs(x, fail), s) }
      // DecimalPrecision wraps comparison/arithmetic operands in
      // WIDENING casts; a widening that preserves both scale capacity
      // and integral digits is value-identity, so unwrap and keep the
      // inner's exact (value, scale)
      case c: Cast if isDec(c.child) && isDec(c) =>
        val (di, dc) = (c.child.dataType.asInstanceOf[DecimalType],
          c.dataType.asInstanceOf[DecimalType])
        if (dc.scale >= di.scale &&
          dc.precision - dc.scale >= di.precision - di.scale)
          decimalOperand(c.child)
        else None
      // decompose +/- so the band patterns still SEE Subtract(x, y) and
      // Add(b, Literal) shapes after normalization (a bare
      // UnscaledValue over the whole subtree would hide them)
      case Subtract(a, b, _) if isDec(a) && isDec(b) =>
        combine(a, b)((l, r) => Subtract(l, r, EvalMode.LEGACY))
      case Add(a, b, _) if isDec(a) && isDec(b) =>
        combine(a, b)((l, r) => Add(l, r, EvalMode.LEGACY))
      // literals fold to unscaled-Long literals HERE: the normalized
      // tree is transient inside this rule, so ConstantFolding never
      // gets a chance to do it and the Literal-requiring patterns
      // would otherwise miss
      case Literal(v: org.apache.spark.sql.types.Decimal, d: DecimalType)
          if d.precision <= 18 =>
        Some((Literal(v.toUnscaledLong, LongType), d.scale))
      case _ => e.dataType match {
        case d: DecimalType if d.precision <= 18 =>
          Some((UnscaledValue(e), d.scale))
        case _ => None
      }
    }

  private def isDec(e: Expression): Boolean =
    e.dataType.isInstanceOf[DecimalType]

  private def combine(a: Expression, b: Expression)(
      f: (Expression, Expression) => Expression): Option[(Expression, Int)] =
    for {
      (ua, sa) <- decimalOperand(a)
      (ub, sb) <- decimalOperand(b)
      s = math.max(sa, sb)
      la <- rescale(ua, sa, s, maxPrecision(a))
      lb <- rescale(ub, sb, s, maxPrecision(b))
    } yield (f(la, lb), s)

  private def rescale(x: Expression, from: Int, to: Int,
                      precision: Int): Option[Expression] =
    if (from == to) Some(x)
    else if (to < from || precision + (to - from) > 18) None
    else {
      val pow = math.pow(10, (to - from).toDouble).toLong
      x match {
        case Literal(l: Long, LongType) => Some(Literal(l * pow, LongType))
        case _ =>
          Some(Multiply(x, Literal(pow, LongType), EvalMode.LEGACY))
      }
    }

  private def maxPrecision(e: Expression): Int = e.dataType match {
    case d: DecimalType => d.precision
    case _ => 18
  }

  /** Detection-only rewrite of a temporal or decimal band conjunct into
    * the integral domain (both operands must normalize, else
    * untouched). The original conjunct is what ends up in the residual,
    * so a normalization that fails to fire only costs the optimization,
    * never correctness.
    */
  /** UTC-epoch and wall-clock-epoch micros inside ONE comparison never
    * mix: NtzMicros (wall epoch) against UnixMicros/UnixDate (UTC
    * epoch) differ by the session-zone offset — not constant under
    * DST, so buckets could land non-adjacent and LOSE in-band rows
    * (the one failure the residual cannot repair). Coerced shapes are
    * unaffected: an analyzer-inserted Cast(ntz AS timestamp) has
    * TimestampType and normalizes through UnixMicros, mirroring
    * exactly the values the original predicate compares.
    */
  private def mixesEpochs(l: Expression, r: Expression): Boolean = {
    def scan(e: Expression): (Boolean, Boolean) = {
      var ntz = false; var utc = false
      e.foreach {
        case _: NtzMicros => ntz = true
        case _: UnixMicros | _: UnixDate => utc = true
        case _ =>
      }
      (ntz, utc)
    }
    val (ln, lu) = scan(l)
    val (rn, ru) = scan(r)
    (ln || rn) && (lu || ru)
  }

  private def normalizeTemporal(e: Expression): Expression = e match {
    case cmp: BinaryComparison =>
      (microsOperand(cmp.left), microsOperand(cmp.right)) match {
        case (Some(l), Some(r)) if mixesEpochs(l, r) => e
        case (Some(l), Some(r)) => cmp.withNewChildren(Seq(l, r))
        case _ =>
          (isDec(cmp.left) || isDec(cmp.right),
            combine(cmp.left, cmp.right)((l, r) =>
              cmp.withNewChildren(Seq(l, r)))) match {
            case (true, Some((normalized, _))) => normalized
            case _ => e
          }
      }
    case _ => e
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
    * correct for negative values, unlike `div`'s truncation toward
    * zero. Computed as truncating div MINUS a negative-remainder
    * adjustment, which is wrap-free over the ENTIRE Long domain (the
    * earlier `(x - pmod(x, w)) div w` floor-multiple form wrapped for
    * x within w of Long.MinValue — a lost-rows hazard the residual
    * cannot repair; caught in the round-11 self-review). LEGACY eval
    * mode so nothing throws under ANSI: w > 0, `x % w` and `x div w`
    * are representable for every Long x, and the −1 adjustment only
    * applies when tdiv > Long.MinValue.
    */
  private def floorBucket(x: Expression, w: Long): Expression = {
    val lx = if (x.dataType == LongType) x else Cast(x, LongType)
    val wl = Literal(w, LongType)
    val tdiv = IntegralDivide(lx, wl, EvalMode.LEGACY)
    val rem = Remainder(lx, wl, EvalMode.LEGACY)
    If(LessThan(rem, Literal(0L, LongType)),
      Subtract(tdiv, Literal(1L, LongType), EvalMode.LEGACY), tdiv)
  }

  /** The detected band: lo <= x - y <= hi on integral sided columns. */
  private case class Band(x: Expression, y: Expression, lo: Long, hi: Long)

  /** Find ONE band among the conjuncts: either a single abs() conjunct
    * (symmetric, lo = -W, hi = W) or exactly one matching upper/lower
    * bound pair on the same (x, y) — the `a.between(b - L1, b + L2)`
    * shape. Ambiguous matches (several candidate pairs) bail out.
    */
  private def findBand(conjuncts: Seq[Expression]): Option[Band] = {
    val abs = conjuncts.collect { case BandPredicate(x, y, w) =>
      Band(x, y, -w, w) }
    val bounds = conjuncts.collect {
      case BoundPredicate(a, b, isUpper, v) => (a, b, isUpper, v) }
    val pairs = for {
      (ux, uy, true, hi) <- bounds
      (lx, ly, false, lo) <- bounds
      if ux.semanticEquals(lx) && uy.semanticEquals(ly) && hi > lo
    } yield Band(ux, uy, lo, hi)
    (abs, pairs) match {
      case (Seq(b), Seq()) => Some(b)
      case (Seq(), Seq(b)) => Some(b)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond).map(normalizeTemporal)
      if (conjuncts.exists(isCrossEqui(_, left, right))) j
      else findBand(conjuncts) match {
        case None => j
        case Some(Band(x, y, lo0, hi0)) =>
          // orient: which band argument comes from which side? (a band
          // on x - y read from the right side flips to y - x in
          // [-hi, -lo])
          val oriented =
            if (x.references.nonEmpty && y.references.nonEmpty &&
              x.references.subsetOf(left.outputSet) &&
              y.references.subsetOf(right.outputSet))
              Some((x, y, lo0, hi0))
            else if (x.references.nonEmpty && y.references.nonEmpty &&
              y.references.subsetOf(left.outputSet) &&
              x.references.subsetOf(right.outputSet))
              Some((y, x, -hi0, -lo0))
            else None
          oriented match {
            case None => j
            // EXTREME literal bounds bail out rather than risk silent
            // Long wrap in the width/shift arithmetic (wrong buckets =
            // LOST rows, the one failure the residual cannot repair);
            // 2^61 is far beyond any timestamp/decimal domain
            case Some((_, _, lo, hi))
                // compare, don't math.abs: abs(Long.MinValue) is
                // negative and would slip through
                if lo < -(1L << 61) || lo > (1L << 61) ||
                  hi < -(1L << 61) || hi > (1L << 61) =>
              j
            case Some((lx, rx, lo, hi)) =>
              // symmetric bands bucket both sides raw at width hi;
              // asymmetric bands shift the right side by lo and bucket
              // at width hi - lo, so lx - (rx + lo) lands in [0, width]
              // and the bucket ids differ by at most 1 either way.
              // (The shift add can still wrap for DATA within |lo| of
              // the Long extremes — but there the ORIGINAL predicate's
              // own x − y arithmetic wraps identically under LEGACY
              // eval, i.e. the naive plan has no well-defined answer
              // either; real temporal/decimal domains sit < 2^61.)
              val (width, rShifted) =
                if (lo == -hi && hi > 0) (hi, rx)
                else (math.max(hi - lo, 1L),
                  Add(if (rx.dataType == LongType) rx else Cast(rx, LongType),
                    Literal(lo, LongType), EvalMode.LEGACY))
              val b = floorBucket(lx, width)
              val one = Literal(1L, LongType)
              val arr = CreateArray(Seq(
                Subtract(b, one, EvalMode.LEGACY), b,
                Add(b, one, EvalMode.LEGACY)))
              val bkAttr = AttributeReference("__graft_band_bk",
                LongType,
                nullable = arr.dataType.asInstanceOf[ArrayType].containsNull)()
              val leftGen = Generate(Explode(arr), unrequiredChildIndex = Nil,
                outer = false, qualifier = None,
                generatorOutput = Seq(bkAttr), child = left)
              val rAlias = Alias(floorBucket(rShifted, width),
                "__graft_band_bk_r")()
              val rightProj = Project(right.output :+ rAlias, right)
              val newCond = And(EqualTo(bkAttr, rAlias.toAttribute), cond)
              val rewritten = Project(j.output,
                Join(leftGen, rightProj, Inner, Some(newCond), hint))
              logInfo(s"BandJoinRewrite: decomposed keyless band join " +
                s"([$lo, $hi]) into a +/-1-bucket equi-join")
              rewritten
          }
      }
  }
}
