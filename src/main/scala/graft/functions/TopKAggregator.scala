package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k per group as a typed Aggregator — the scale answer to
  * per-group top-k. The window formulation
  * (`row_number over (partition by g order by s desc) <= k`) must
  * shuffle and sort EVERY row of the group; this buffer never exceeds k
  * entries, so partial aggregation caps the shuffle at k rows per group
  * per map partition regardless of group size — at 100 TB the
  * difference between moving the dataset and moving k·groups rows.
  *
  * Determinism: the order (score DESC, id ASC) is total whenever ids
  * are unique, so results are reproducible and oracle-checkable even
  * though partial-merge ORDER is scheduler-dependent (contrast
  * [[CentroidAggregator]], where float summation order matters).
  *
  * k is expected small (top-N per entity); the sorted-vector insert is
  * O(k) per row. A binary-heap buffer would shave constants for large
  * k but serializes worse through the Encoder.
  */
class TopKAggregator(k: Int)
    extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {

  // k=0 would crash reduce's fast path on b.last; k<0 would silently
  // drop every row via take(k) — both are constructor bugs, fail loudly
  require(k > 0, s"TopKAggregator requires k > 0, got $k")

  private val ord: Ordering[ScoredId] =
    Ordering.by((s: ScoredId) => (-s.score, s.id))

  override def zero: Seq[ScoredId] = Vector.empty

  override def reduce(b: Seq[ScoredId], v: ScoredId): Seq[ScoredId] =
    if (b.length == k && ord.lteq(b.last, v)) b // below the bar: no-op
    else ((b :+ v).sorted(ord)).take(k)

  override def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] =
    (a ++ b).sorted(ord).take(k)

  override def finish(b: Seq[ScoredId]): Seq[ScoredId] = b

  override def bufferEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()

  override def outputEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
}

/** One scored row in a top-k buffer; id must be unique for a total order. */
final case class ScoredId(score: Double, id: Long)
