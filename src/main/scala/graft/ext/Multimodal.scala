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
   * REAL metadata extraction (no media libraries needed — container headers
   * are plain bytes): sniffs PNG/JPEG/GIF/WAV payloads and fills the meta
   * struct with format, dimensions, and audio duration. Unrecognized
   * payloads keep their existing meta. Same mapPartitions plumbing as the
   * feature path; only the PIXEL/SAMPLE decode below remains stubbed.
   */
  def parseMeta(media: DataFrame): DataFrame = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(media.schema))
    val idxContent = media.schema.fieldIndex("content")
    val idxMeta = media.schema.fieldIndex("meta")
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idxContent)
        sniffMeta(bytes) match {
          case Some((fmt, w, h, dur)) =>
            Row.fromSeq(r.toSeq.updated(idxMeta, Row(fmt,
              if (w < 0) null else Int.box(w),
              if (h < 0) null else Int.box(h),
              if (dur < 0) null else Long.box(dur))))
          case None => r
        }
      }
    }(enc)
  }

  /** Pure-byte container sniffing: (format, width, height, durationMs);
    * -1 marks not-applicable. PNG IHDR, JPEG SOF scan, GIF logical screen,
    * WAV fmt+data chunks. */
  private[ext] def sniffMeta(b: Array[Byte]): Option[(String, Int, Int, Long)] = {
    def u8(i: Int): Int = b(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int): Int = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long = (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) |
      (u8(i + 3).toLong << 24)) & 0xffffffffL
    if (b == null || b.length < 12) None
    // PNG: 8-byte signature, then IHDR chunk (len+type+data): width/height
    // big-endian at offsets 16/20
    else if (b.length >= 24 && u8(0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G')
      Some(("png", be32(16), be32(20), -1L))
    // JPEG: FFD8, then marker segments; frame dims live in the first SOFn
    else if (u8(0) == 0xff && u8(1) == 0xd8) {
      var i = 2
      var out: Option[(String, Int, Int, Long)] = None
      while (out.isEmpty && i + 9 < b.length && u8(i) == 0xff) {
        val marker = u8(i + 1)
        // SOF0..SOF15 minus DHT(C4)/JPG(C8)/DAC(CC)
        if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc)
          out = Some(("jpeg", be16(i + 7), be16(i + 5), -1L))
        else i += 2 + be16(i + 2) // skip this segment (length excludes marker)
      }
      out
    }
    // GIF: "GIF87a"/"GIF89a", logical screen w/h little-endian at 6/8
    else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8')
      Some(("gif", le16(6), le16(8), -1L))
    // WAV: RIFF....WAVE; walk chunks for fmt (byte rate) and data (size)
    else if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
             b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') {
      var i = 12
      var byteRate = 0L
      var dataSize = -1L
      var ok = true
      while (ok && i + 8 <= b.length && (byteRate == 0L || dataSize < 0)) {
        val id = new String(b, i, 4, "US-ASCII")
        val size = le32(i + 4) // unsigned 32-bit; untrusted
        if (id == "fmt " && i + 8 + 16 <= b.length) byteRate = le32(i + 8 + 8)
        else if (id == "data") dataSize = size
        // word-aligned advance, computed in Long: a crafted size >= 2^31
        // would overflow an Int advance to <= 0 and spin this loop forever
        val next = i.toLong + 8L + size + (size & 1L)
        if (next <= i || next > b.length) ok = false // malformed: keep parsed
        else i = next.toInt
      }
      val dur = if (byteRate > 0 && dataSize >= 0) dataSize * 1000L / byteRate else -1L
      Some(("wav", -1, -1, dur))
    }
    else None
  }

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
