package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for the training-data pipeline: media
  * payloads are opaque BINARY columns with typed metadata; per-batch
  * decode / feature-extract / frame-sample run as partition-local batch
  * functions (mapPartitions), which is where a real image/audio codec
  * would slot in. The codec itself is STUBBED — this container has no
  * media libraries — with a deterministic fake, so the Spark-side
  * contract (schema, partitioning, batch shape) is real and tested while
  * the pixel math is not.
  */
object MultimodalOps {

  /** Schema of a multimodal asset table. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))),
      nullable = true)))

  val featureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("checksum", LongType, nullable = false),
    StructField("feature", ArrayType(FloatType, containsNull = false),
      nullable = false)))

  /** Deterministic fake "decode + embed": a real implementation would
    * hand the payload bytes to a codec here. The batch shape (iterator of
    * rows per partition, one output row per asset) and the schema are the
    * production contract; only the byte math is fake.
    */
  def extractFeatures(assets: DataFrame, dim: Int = 8): DataFrame = {
    val spark = assets.sparkSession
    val out = assets.select("asset_id", "payload").rdd.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0)
        val payload =
          if (row.isNullAt(1)) Array.empty[Byte]
          else row.getAs[Array[Byte]](1)
        var crc = 0L
        payload.foreach(b => crc = (crc * 31 + (b & 0xff)) % 1000000007L)
        // ??? <- real codec call site; deterministic fake feature instead
        val feature = Array.tabulate(dim) { d =>
          (((crc >> (d * 4)) & 0xff).toFloat / 255.0f)
        }
        Row(id, payload.length, crc, feature.toSeq)
      }
    }
    spark.createDataFrame(out, featureSchema)
  }

  /** Frame sampling: one row per sampled frame timestamp, driven purely
    * by metadata (duration), every `everyMs` ms — declarative explode, no
    * decode needed until the downstream consumer touches the payload.
    */
  def sampleFrames(assets: DataFrame, everyMs: Long): DataFrame =
    assets
      .filter(col("media_type") === "video" &&
        col("meta.duration_ms").isNotNull &&
        col("meta.duration_ms") > 0) // zero-length media: no frames, not a crash
      .select(col("asset_id"),
        explode(sequence(lit(0L), col("meta.duration_ms") - 1,
          lit(everyMs))).as("frame_ts_ms"))

  /** Resize is a metadata transform until decode time: record the target
    * geometry, preserving aspect ratio (the decode stub would apply it).
    */
  def planResize(assets: DataFrame, maxSide: Int): DataFrame =
    assets.withColumn("scale",
        when(greatest(col("meta.width"), col("meta.height")) <= maxSide, 1.0)
          .otherwise(lit(maxSide) /
            greatest(col("meta.width"), col("meta.height"))))
      .withColumn("target_width",
        ceil(col("meta.width") * col("scale")).cast("int"))
      .withColumn("target_height",
        ceil(col("meta.height") * col("scale")).cast("int"))
}
