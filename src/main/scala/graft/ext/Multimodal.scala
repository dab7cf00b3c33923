package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: image/audio/video as opaque `binary` columns
 * with a typed metadata struct, processed batch-at-a-time with
 * `mapPartitions` (the JVM analog of Python's mapInPandas: one iterator per
 * partition, schema declared up front, decode libraries loaded once per
 * partition, batch shape preserved).
 *
 * The actual media decode is STUBBED (no image/audio libs in this
 * environment): `fakeDecode` derives deterministic features from the bytes.
 * The Spark-side contract — schema, partitioning, per-partition init,
 * output shape — is real and tested.
 */
object Multimodal {

  /** Canonical multimodal schema: id + modality + raw bytes + metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType))))))

  /** Build a media DataFrame from any source with an id and a payload column
    * (payload bytes stand in for real image/audio data). */
  def fromBinary(df: DataFrame, idCol: String, payloadCol: String,
                 modality: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      lit(modality).as("modality"),
      col(payloadCol).cast(BinaryType).as("content"),
      struct(
        lit("raw").as("format"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit(null).cast(LongType).as("duration_ms")).as("meta"))

  /**
   * STUB decode: a real implementation would decode the image/audio inside
   * `mapPartitions` (decoder initialized once per partition, exactly where
   * a Python pipeline would use mapInPandas). Here the "features" are a
   * deterministic fold of the bytes — shape and plumbing identical.
   */
  def decodeFeatures(media: DataFrame, featureDim: Int = 8): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(media.schema.fields.filterNot(_.name == "content") ++ Seq(
      StructField("features", ArrayType(FloatType)),
      StructField("content_bytes", LongType)))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val idxId = media.schema.fieldIndex("media_id")
    val idxMod = media.schema.fieldIndex("modality")
    val idxContent = media.schema.fieldIndex("content")
    val idxMeta = media.schema.fieldIndex("meta")
    media.mapPartitions { rows =>
      // per-partition init happens here (decoder handle, model weights, ...)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idxContent)
        val feats = stubFeatures(bytes, featureDim)
        Row(r.get(idxId), r.get(idxMod), r.get(idxMeta), feats,
          if (bytes == null) 0L else bytes.length.toLong)
      }
    }(enc)
  }

  /** Deterministic stand-in for a media feature extractor (??? in spirit):
    * folds bytes into `dim` float accumulators. Replace with a real decoder
    * when the runtime has one. */
  private[ext] def stubFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
    val acc = new Array[Float](dim)
    if (bytes != null) {
      var i = 0
      while (i < bytes.length) {
        acc(i % dim) += (bytes(i) & 0xff) / 255.0f
        i += 1
      }
    }
    acc
  }

  /** STUB resize: a real implementation would decode, scale and re-encode
    * inside the mapPartitions batch (same plumbing as [[decodeFeatures]]);
    * the stand-in keeps every `factor`-th byte — deterministic and
    * size-contract-preserving (output length = ceil(len/factor)). */
  def resizeStub(media: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1)
    val enc = ExpressionEncoder(RowEncoder.encoderFor(media.schema))
    val idxContent = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idxContent)
        val out =
          if (bytes == null) null
          else {
            val o = new Array[Byte]((bytes.length + factor - 1) / factor)
            var i = 0
            while (i < o.length) { o(i) = bytes(i * factor); i += 1 }
            o
          }
        Row.fromSeq(r.toSeq.updated(idxContent, out))
      }
    }(enc)
  }

  /** Frame sampling for video-like payloads: every `stride`-th block of
    * `blockSize` bytes becomes one "frame" row. Pure Spark: posexplode over
    * a computed slice array — no driver loops. */
  def sampleFrames(media: DataFrame, blockSize: Int, stride: Int): DataFrame = {
    val nBlocks = ceil(length(col("content")).cast("double") / blockSize).cast("int")
    media
      .withColumn("_frame_idx",
        filter(sequence(lit(0), greatest(nBlocks - 1, lit(0))), i => i % stride === 0))
      .select(col("media_id"), col("modality"),
        posexplode(transform(col("_frame_idx"),
          i => substring(col("content"), (i * blockSize) + 1, lit(blockSize)))))
      .select(col("media_id"), col("modality"),
        col("pos").as("frame_no"), col("col").as("frame_bytes"))
  }
}
