package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed element-wise mean of embedding vectors — the production path for
  * IVF cell centroids: a constant-size mutable buffer merged partially on
  * every partition, so no per-group row materialization (contrast with
  * the collect_list+fold formulation in ann_ivf_topk, which exists only
  * because the DuckDB oracle needs a bit-reproducible summation order;
  * partial-merge order here is scheduler-dependent, which is fine for
  * production ANN and required reading for anyone expecting bitwise
  * determinism from distributed float sums).
  *
  * Usage:
  *   ds.groupByKey(_.label).agg(new CentroidAggregator(64).toColumn)
  */
class CentroidAggregator(dim: Int)
    extends Aggregator[Array[Float], CentroidBuffer, Array[Double]] {

  override def zero: CentroidBuffer =
    CentroidBuffer(new Array[Double](dim), 0L)

  override def reduce(b: CentroidBuffer, v: Array[Float]): CentroidBuffer = {
    val n = math.min(dim, v.length)
    var i = 0
    while (i < n) { b.sums(i) += v(i); i += 1 }
    b.copy(count = b.count + 1)
  }

  override def merge(a: CentroidBuffer, b: CentroidBuffer): CentroidBuffer = {
    var i = 0
    while (i < dim) { a.sums(i) += b.sums(i); i += 1 }
    a.copy(count = a.count + b.count)
  }

  override def finish(b: CentroidBuffer): Array[Double] =
    if (b.count == 0) new Array[Double](dim)
    else b.sums.map(_ / b.count)

  override def bufferEncoder: Encoder[CentroidBuffer] =
    Encoders.product[CentroidBuffer]

  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}

/** Mutable-array partial state for CentroidAggregator. */
final case class CentroidBuffer(sums: Array[Double], count: Long)
