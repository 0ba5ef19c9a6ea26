package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** A NATIVE as-of join operator — the full custom-operator stack the
  * engine's architecture reserves for semantics Spark's built-ins can't
  * express as a single operator: a custom `LogicalPlan` node, a
  * `SparkStrategy`, and a physical `SparkPlan` whose
  * requiredChildDistribution/Ordering let EnsureRequirements plan the
  * exchanges and sorts, then a per-partition two-pointer MERGE pairs
  * each left row with the latest right row at-or-before it.
  *
  * Why an operator instead of the union+window rewrite (q_asof_join):
  * the rewrite unions both schemas into one null-padded stream and
  * sorts the union; the operator sorts each side in its own (narrower)
  * schema and streams the merge with O(1) state — no padded columns
  * through the sort, no window buffer, and the contract is explicit in
  * the plan (AsOfJoinExec node) rather than implied by a filter over
  * IGNORE NULLS windows. Both sides cluster on the join keys, so at
  * scale this is two co-partitioned sorts — the same shuffle shape as a
  * sort-merge join.
  *
  * Semantics: LEFT OUTER as-of. direction = "backward" pairs each left
  * row with the right row of the same key with the greatest time ≤
  * left time (tie-break: last wins); "forward" pairs it with the
  * smallest time ≥ left time (tie-break: first wins — the mirror
  * convention both window rewrites use). Unmatched left rows null-pad
  * the right side. Rows with null keys or null times never match (SQL
  * equality semantics). Time columns must be long-backed
  * (LONG / TIMESTAMP / TIMESTAMP_NTZ / INT / DATE).
  */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightTieBreak: Seq[Expression],
    direction: String = "backward") extends BinaryNode {

  require(direction == "backward" || direction == "forward",
    s"unknown as-of direction '$direction'")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans the logical as-of node to its physical merge operator. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, tb, dir) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tb,
        dir) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightTieBreak: Seq[Expression],
    direction: String = "backward") extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Both sides cluster on their keys — EnsureRequirements inserts the
    * (co-partitioned) exchanges exactly as for a shuffled join.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  /** Each side sorted by (keys, time[, tie-break]) — the merge then
    * needs only a buffered iterator and one remembered match.
    */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    ((rightKeys :+ rightTime) ++ rightTieBreak).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val lOut = left.output
    val rOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val rWidth = rOut.length
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val lTimeEval = BindReferences.bindReference(lTime, lOut)
      val rTimeEval = BindReferences.bindReference(rTime, rOut)
      def asLong(v: Any): Long = v match {
        case l: Long => l
        case i: Int => i.toLong
        case other => throw new IllegalArgumentException(
          s"as-of time must be long-backed, got ${other.getClass}")
      }
      val fwd = direction == "forward"
      val rBuf = rIter.buffered
      val nullRight = new GenericInternalRow(rWidth)
      val joiner = new JoinedRow
      // backward state: the latest right row (copied — iterator rows
      // are reused buffers) with time ≤ current left time, + its key
      var lastMatch: InternalRow = null
      var lastMatchKey: UnsafeRow = null
      lIter.map { lrow =>
        val lk = lKeyProj(lrow)
        val ltVal = lTimeEval.eval(lrow)
        if (lk.anyNull || ltVal == null) {
          joiner(lrow, nullRight)
        } else {
          val lt = asLong(ltVal)
          var done = false
          var fwdMatch: InternalRow = null
          while (!done && rBuf.hasNext) {
            val head = rBuf.head
            val rk = rKeyProj(head)
            if (rk.anyNull) { rBuf.next(); () } // null keys never match
            else {
              val cmp = keyOrd.compare(rk, lk)
              if (cmp < 0) { rBuf.next(); () } // right key behind left
              else if (cmp > 0) done = true
              else {
                val rtVal = rTimeEval.eval(head)
                if (rtVal == null) { rBuf.next(); () }
                else if (fwd) {
                  // discard rows strictly before lt (no later left row
                  // can need them — left times are non-decreasing);
                  // the first survivor of this key IS the match, and
                  // stays buffered for the next left row
                  if (asLong(rtVal) < lt) { rBuf.next(); () }
                  else { fwdMatch = head; done = true }
                } else if (asLong(rtVal) <= lt) {
                  lastMatch = rBuf.next().copy()
                  lastMatchKey = rk.copy() // rk reads head's buffer
                } else done = true
              }
            }
          }
          if (fwd) {
            joiner(lrow, if (fwdMatch != null) fwdMatch else nullRight)
          } else {
            val matched = lastMatchKey != null &&
              keyOrd.compare(lastMatchKey, lk) == 0
            joiner(lrow, if (matched) lastMatch else nullRight)
          }
        }
      }
    }
  }
}
