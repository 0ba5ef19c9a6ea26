package graft.multimodal

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

class MultimodalSpec extends AnyFunSuite with SparkSuite {

  private def assets() = {
    val rows = Seq(
      Row(1L, "image", "img-bytes-1".getBytes("UTF-8"), Row(800, 600, null)),
      Row(2L, "video", "vid-bytes".getBytes("UTF-8"), Row(1920, 1080, 2500L)),
      Row(3L, "audio", null, Row(null, null, 60000L)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), MultimodalOps.assetSchema)
  }

  test("extractFeatures: deterministic fake decode, fixed dim, null-safe") {
    val f1 = MultimodalOps.extractFeatures(assets()).orderBy("asset_id")
      .collect()
    val f2 = MultimodalOps.extractFeatures(assets()).orderBy("asset_id")
      .collect()
    assert(f1.toSeq == f2.toSeq) // deterministic across runs
    assert(f1.length == 3)       // null payload still yields a row
    assert(f1.forall(_.getSeq[Float](3).size == 8))
    assert(f1(0).getInt(1) == "img-bytes-1".length)
    assert(f1(2).getInt(1) == 0) // null payload -> 0 bytes
  }

  test("sampleFrames: every 1000ms over duration, videos only") {
    val frames = MultimodalOps.sampleFrames(assets(), everyMs = 1000)
      .orderBy("frame_ts_ms").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(frames.toSeq == Seq((2L, 0L), (2L, 1000L), (2L, 2000L)))
  }

  test("planResize: aspect-preserving downscale plan") {
    val plan = MultimodalOps.planResize(assets(), maxSide = 960)
      .select("asset_id", "target_width", "target_height")
      .orderBy("asset_id").collect()
    assert(plan(0).getInt(1) == 800 && plan(0).getInt(2) == 600) // untouched
    assert(plan(1).getInt(1) == 960 && plan(1).getInt(2) == 540) // 1920x1080/2
  }
}
