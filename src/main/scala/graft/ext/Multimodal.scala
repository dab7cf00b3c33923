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
 * Decode is REAL for the formats the JDK itself ships codecs for —
 * `javax.imageio` (PNG/JPEG/GIF/BMP pixels) and `javax.sound.sampled`
 * (WAV/PCM samples), both headless-safe, no external libraries — and falls
 * back to a deterministic byte-fold stand-in for everything else (video:
 * the JDK has no codec; real deployments drop a decoder into the same
 * mapPartitions slot). The Spark-side contract — schema, partitioning,
 * per-partition init, output shape — is identical on both paths.
 */
object Multimodal {

  // executor-side one-time init: no ImageIO disk cache (tmp-file churn per
  // decode), headless AWT (no display on executors)
  private lazy val imageIoReady: Boolean = {
    System.setProperty("java.awt.headless", "true")
    javax.imageio.ImageIO.setUseCache(false)
    true
  }

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
  private[graft] def sniffMeta(b: Array[Byte]): Option[(String, Int, Int, Long)] = {
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
    // AVI: RIFF....AVI ; dims + duration from the avih header via the
    // full container parse (the header lives inside a LIST, so the walk
    // is the same code the frame decoder uses)
    else if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
             b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' ')
      parseAvi(b).map { c =>
        val dur =
          if (c.usecPerFrame > 0 && c.totalFrames > 0)
            c.usecPerFrame * c.totalFrames / 1000L
          else -1L
        ("avi", c.width, c.height, dur)
      }
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
   * Feature extraction inside `mapPartitions` (decoder state initialized
   * once per partition — the JVM analog of Python's mapInPandas). Real
   * decode where the JDK has a codec:
   *  - images (png/jpeg/gif/bmp): pixel luminance histogram over
   *    `featureDim` buckets, normalized — a real, deterministic content
   *    signature (two visually different images separate; re-encodes of the
   *    same pixels collide).
   *  - audio (wav/pcm): RMS energy over `featureDim` equal time slices,
   *    normalized to [0,1] — a coarse loudness envelope.
   *  - everything else (incl. video — no JDK codec): deterministic
   *    byte-fold stand-in, same shape.
   */
  /** Pluggable per-modality decoder seam: a runtime that ships a real codec
    * this sandbox lacks (ffmpeg JNI for video is the canonical case)
    * registers one here and [[decodeFeatures]] consults it BEFORE the
    * built-in JDK decoders. Implementations must be Serializable — the
    * registered decoder ships to executors inside the mapPartitions
    * closure (captured at PLAN time: register before building the frame). */
  trait MediaDecoder extends Serializable {
    def features(bytes: Array[Byte], dim: Int): Option[Array[Float]]
  }
  private val customDecoders =
    new java.util.concurrent.ConcurrentHashMap[String, MediaDecoder]()
  def registerDecoder(modality: String, d: MediaDecoder): Unit =
    customDecoders.put(modality, d)
  def unregisterDecoder(modality: String): Unit =
    customDecoders.remove(modality)

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
    // snapshot the registered decoders now — the map rides the closure
    val customs: Map[String, MediaDecoder] = {
      import scala.jdk.CollectionConverters._
      customDecoders.asScala.toMap
    }
    media.mapPartitions { rows =>
      val _ = imageIoReady // per-partition decoder init
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idxContent)
        val modality = r.getString(idxMod)
        val feats = customs.get(modality)
          .flatMap(d => try d.features(bytes, featureDim) catch { case _: Exception => None })
          .orElse(realFeatures(modality, bytes, featureDim))
          .getOrElse(stubFeatures(bytes, featureDim))
        Row(r.get(idxId), r.get(idxMod), r.get(idxMeta), feats,
          if (bytes == null) 0L else bytes.length.toLong)
      }
    }(enc)
  }

  /** JDK-codec feature extraction; None when the payload isn't decodable
    * (caller falls back to the byte-fold stand-in). */
  private[graft] def realFeatures(modality: String, bytes: Array[Byte],
                                dim: Int): Option[Array[Float]] = {
    if (bytes == null || bytes.isEmpty) return None
    try modality match {
      case "image" =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) None
        else {
          // luminance histogram over dim buckets (ITU-R 601 weights)
          val acc = new Array[Float](dim)
          val w = img.getWidth; val h = img.getHeight
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val lum = 0.299 * ((rgb >> 16) & 0xff) +
                0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
              val bucket = math.min(dim - 1, (lum / 256.0 * dim).toInt)
              acc(bucket) += 1f
              x += 1
            }
            y += 1
          }
          val n = (w.toLong * h).toFloat
          var i = 0
          while (i < dim) { acc(i) /= n; i += 1 }
          Some(acc)
        }
      case "audio" =>
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = in.getFormat
          if (fmt.getSampleSizeInBits != 16) None
          else {
            val data = in.readAllBytes()
            val nSamples = data.length / 2
            if (nSamples == 0) None
            else {
              val acc = new Array[Double](dim)
              val cnt = new Array[Long](dim)
              val bigEndian = fmt.isBigEndian
              var i = 0
              while (i < nSamples) {
                val lo = data(2 * i) & 0xff; val hi = data(2 * i + 1) & 0xff
                val s = (if (bigEndian) (lo << 8) | hi else (hi << 8) | lo).toShort / 32768.0
                val slice = math.min(dim - 1, (i.toLong * dim / nSamples).toInt)
                acc(slice) += s * s
                cnt(slice) += 1
                i += 1
              }
              Some(Array.tabulate(dim)(j =>
                if (cnt(j) == 0) 0f else math.sqrt(acc(j) / cnt(j)).toFloat))
            }
          }
        } finally in.close()
      case _ => None // video: no JDK codec — byte-fold stand-in
    } catch { case _: Exception => None }
  }

  /** Deterministic stand-in for a media feature extractor (??? in spirit):
    * folds bytes into `dim` float accumulators. Replace with a real decoder
    * when the runtime has one. */
  private[graft] def stubFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
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

  /**
   * REAL image resize (JDK codecs): decode, scale so the longest side is at
   * most `maxDim` (aspect preserved, bilinear), re-encode as PNG, refresh
   * the meta dims. Payloads ImageIO can't decode pass through unchanged —
   * the behavior a 100 TB corpus job needs (a corrupt image must not kill
   * the stage). Same mapPartitions batch plumbing as [[decodeFeatures]].
   */
  def resizeImages(media: DataFrame, maxDim: Int): DataFrame = {
    require(maxDim >= 1)
    val enc = ExpressionEncoder(RowEncoder.encoderFor(media.schema))
    val idxContent = media.schema.fieldIndex("content")
    val idxMeta = media.schema.fieldIndex("meta")
    media.mapPartitions { rows =>
      val _ = imageIoReady
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idxContent)
        val resized =
          try {
            if (bytes == null) None
            else Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))).flatMap { img =>
              val w = img.getWidth; val h = img.getHeight
              if (math.max(w, h) <= maxDim) None // already small enough
              else {
                val scale = maxDim.toDouble / math.max(w, h)
                val nw = math.max(1, (w * scale).round.toInt)
                val nh = math.max(1, (h * scale).round.toInt)
                val out = new java.awt.image.BufferedImage(nw, nh,
                  java.awt.image.BufferedImage.TYPE_INT_RGB)
                val g = out.createGraphics()
                g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                  java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
                g.drawImage(img, 0, 0, nw, nh, null)
                g.dispose()
                val bos = new java.io.ByteArrayOutputStream()
                javax.imageio.ImageIO.write(out, "png", bos)
                Some((bos.toByteArray, nw, nh))
              }
            }
          } catch { case _: Exception => None }
        resized match {
          case Some((png, nw, nh)) =>
            Row.fromSeq(r.toSeq
              .updated(idxContent, png)
              .updated(idxMeta, Row("png", Int.box(nw), Int.box(nh), null)))
          case None => r
        }
      }
    }(enc)
  }

  /** Byte-subsample stand-in resize for NON-image payloads (kept for the
    * modalities the JDK cannot decode): keeps every `factor`-th byte —
    * deterministic and size-contract-preserving
    * (output length = ceil(len/factor)). */
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

  // ===================================================================
  // Video: pure-JVM AVI container parsing (RIFF chunks are plain bytes —
  // no codec library needed for the CONTAINER) + a frame decoder for the
  // two payloads the JVM can actually turn into pixels: MJPEG ('00dc'
  // frames that are whole JPEGs — ImageIO decodes those) and uncompressed
  // bottom-up BGR DIB ('00db' frames — raw bytes + the strf header's
  // dimensions). Registered behind the [[MediaDecoder]] seam like any
  // external codec would be; anything the parser can't read falls back to
  // the byte-fold stand-in, same as before.
  // ===================================================================

  /** Parsed AVI: (width, height, usecPerFrame, totalFrames, frames) —
    * frame bytes in stream order from the movi list ('00db'/'00dc'). */
  private[graft] case class AviClip(width: Int, height: Int,
                                  usecPerFrame: Long, totalFrames: Long,
                                  frames: Seq[Array[Byte]])

  /** Walk the RIFF structure: 'RIFF' size 'AVI ', LIST chunks ('hdrl'
    * carrying the avih header, 'movi' carrying frame chunks). Returns None
    * for anything that is not a well-formed AVI — the caller's fallback
    * contract, a corrupt clip must not kill the stage. */
  private[graft] def parseAvi(b: Array[Byte]): Option[AviClip] = {
    def le16(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    def le32(i: Int): Long = ((b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3).toLong & 0xff) << 24)) & 0xffffffffL
    def fourcc(i: Int): String = new String(b, i, 4, "US-ASCII")
    if (b == null || b.length < 24) return None
    if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
    var width = -1; var height = -1
    var usecPerFrame = -1L; var totalFrames = -1L
    val frames = Seq.newBuilder[Array[Byte]]
    // chunk walker: (offset, limit) — LIST bodies recurse
    def walk(off0: Int, limit: Int): Unit = {
      var off = off0
      while (off + 8 <= limit) {
        val id = fourcc(off)
        val size = le32(off + 4)
        val body = off + 8
        val end = body + size
        if (end > limit || end < body) return // malformed length: stop here
        id match {
          case "LIST" if size >= 4 =>
            val listType = fourcc(body)
            // hdrl carries avih/strl headers; movi carries the frames
            if (listType == "hdrl" || listType == "movi" || listType == "strl")
              walk(body + 4, end.toInt)
          case "avih" if size >= 40 =>
            usecPerFrame = le32(body)
            totalFrames = le32(body + 16)
            width = le32(body + 32).toInt
            height = le32(body + 36).toInt
          case "strf" if size >= 24 && width < 0 =>
            // BITMAPINFOHEADER fallback when avih was absent
            width = le32(body + 4).toInt
            height = le32(body + 8).toInt
          case _ if id.take(2).forall(_.isDigit) &&
                    (id.substring(2) == "db" || id.substring(2) == "dc") =>
            // '00db' uncompressed / '00dc' compressed frame of stream NN
            frames += java.util.Arrays.copyOfRange(b, body, end.toInt)
          case _ => ()
        }
        // chunks are word-aligned: odd sizes pad one byte
        off = end.toInt + (size & 1L).toInt
      }
    }
    walk(12, b.length)
    val fs = frames.result()
    if (fs.isEmpty) None
    else Some(AviClip(width, height, usecPerFrame,
      if (totalFrames >= 0) totalFrames else fs.length.toLong, fs))
  }

  /** Luminance histogram of one AVI frame: MJPEG frames decode through
    * ImageIO; '00db' raw frames are bottom-up BGR rows (the DIB layout)
    * iff their length is exactly w*h*3. None = undecodable frame. */
  private[graft] def frameLumaHist(frame: Array[Byte], w: Int, h: Int,
                                 dim: Int): Option[Array[Float]] = {
    if (frame.length >= 2 && (frame(0) & 0xff) == 0xff && (frame(1) & 0xff) == 0xd8) {
      // JPEG frame
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(frame))
      if (img == null) None
      else {
        val acc = new Array[Float](dim)
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            val lum = 0.299 * ((rgb >> 16) & 0xff) +
              0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
            acc(math.min(dim - 1, (lum / 256.0 * dim).toInt)) += 1f
            x += 1
          }
          y += 1
        }
        val n = (img.getWidth.toLong * img.getHeight).toFloat
        Some(acc.map(_ / n))
      }
    } else if (w > 0 && h > 0 && frame.length == w * h * 3) {
      // raw bottom-up BGR rows
      val acc = new Array[Float](dim)
      var i = 0
      while (i < frame.length) {
        val bl = frame(i) & 0xff; val g = frame(i + 1) & 0xff
        val r = frame(i + 2) & 0xff
        val lum = 0.299 * r + 0.587 * g + 0.114 * bl
        acc(math.min(dim - 1, (lum / 256.0 * dim).toInt)) += 1f
        i += 3
      }
      Some(acc.map(_ / (w.toLong * h).toFloat))
    } else None
  }

  /** The video [[MediaDecoder]]: mean luminance histogram over the clip's
    * decodable frames — the video analog of the image path's signature
    * (two clips with different content separate; a re-mux of the same
    * frames collides). Register with
    * `Multimodal.registerDecoder("video", Multimodal.AviDecoder)`. */
  object AviDecoder extends MediaDecoder {
    def features(bytes: Array[Byte], dim: Int): Option[Array[Float]] =
      parseAvi(bytes).flatMap { clip =>
        val hists = clip.frames.flatMap(f =>
          frameLumaHist(f, clip.width, clip.height, dim))
        if (hists.isEmpty) None
        else Some(Array.tabulate(dim)(j =>
          hists.map(_(j)).sum / hists.length))
      }
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
