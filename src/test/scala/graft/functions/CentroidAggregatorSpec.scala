package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

class CentroidAggregatorSpec extends AnyFunSuite with SparkSuite {

  test("typed centroid matches the arithmetic mean per group") {
    import spark.implicits._
    val data = Seq(
      (0, Array(1.0f, 2.0f)), (0, Array(3.0f, 6.0f)),
      (1, Array(10.0f, 0.0f)))
    val ds = data.toDS()
    val got = ds.groupByKey(_._1)
      .mapValues(_._2)
      .agg(new CentroidAggregator(2).toColumn)
      .collect().toMap
    // FP tolerance: partial-merge order is scheduler-dependent by design
    assert(math.abs(got(0)(0) - 2.0) < 1e-12 &&
      math.abs(got(0)(1) - 4.0) < 1e-12)
    assert(got(1).toSeq == Seq(10.0, 0.0))
  }

  test("empty group yields a zero centroid, short vectors are tolerated") {
    val agg = new CentroidAggregator(3)
    assert(agg.finish(agg.zero).toSeq == Seq(0.0, 0.0, 0.0))
    val b = agg.reduce(agg.zero, Array(1.0f)) // shorter than dim
    assert(agg.finish(b).toSeq == Seq(1.0, 0.0, 0.0))
  }
}
