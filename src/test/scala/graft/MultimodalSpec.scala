package graft

import graft.ext.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  def media = Multimodal.fromBinary(
    sf("sf0.001", "documents").limit(20)
      .select(col("doc_id"), col("text").cast("binary").as("payload")),
    "doc_id", "payload", "image")

  test("fromBinary: canonical schema with binary content + meta struct") {
    assert(media.schema.fieldNames.toSeq ===
      Seq("media_id", "modality", "content", "meta"))
    assert(media.schema("content").dataType ===
      org.apache.spark.sql.types.BinaryType)
    assert(media.count() === 20)
  }

  test("decodeFeatures: stub decode keeps shape, deterministic, batch plumbing") {
    val f1 = Multimodal.decodeFeatures(media, featureDim = 8)
    assert(f1.schema.fieldNames.toSeq ===
      Seq("media_id", "modality", "meta", "features", "content_bytes"))
    val rows = f1.orderBy("media_id").collect()
    assert(rows.length === 20)
    assert(rows.forall(_.getSeq[Float](3).length === 8))
    // deterministic across runs and partitionings
    val f2 = Multimodal.decodeFeatures(media.repartition(7), featureDim = 8)
      .orderBy("media_id").collect()
    assert(rows.map(_.getSeq[Float](3)).toSeq === f2.map(_.getSeq[Float](3)).toSeq)
    // content_bytes matches original payload length
    val lens = sf("sf0.001", "documents").limit(20)
      .select(col("doc_id"), length(col("text")).cast("long").as("len"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.forall(r => r.getLong(4) === lens(r.getLong(0))))
  }

  test("pluggable decoder seam: registered video decoder wins, unregister restores stand-in") {
    val video = Multimodal.fromBinary(
      sf("sf0.001", "documents").limit(10)
        .select(col("doc_id"), col("text").cast("binary").as("payload")),
      "doc_id", "payload", "video")
    val standIn = Multimodal.decodeFeatures(video, featureDim = 4)
      .orderBy("media_id").collect().map(_.getSeq[Float](3))
    // a runtime with a real codec registers one; ours returns a marker
    Multimodal.registerDecoder("video", new Multimodal.MediaDecoder {
      def features(bytes: Array[Byte], dim: Int): Option[Array[Float]] =
        Some(Array.tabulate(dim)(i => (if (bytes == null) 0 else bytes.length % 97) + i.toFloat))
    })
    try {
      val plugged = Multimodal.decodeFeatures(video, featureDim = 4)
        .orderBy("media_id").collect()
      assert(plugged.forall { r =>
        val f = r.getSeq[Float](3)
        f.length == 4 && f(1) == f(0) + 1f // marker shape: the custom decoder ran
      })
      assert(plugged.map(_.getSeq[Float](3)).toSeq !== standIn.toSeq)
      // other modalities untouched by the video decoder
      val img = Multimodal.decodeFeatures(media, featureDim = 4)
        .orderBy("media_id").collect()
      assert(img.length === 20)
    } finally Multimodal.unregisterDecoder("video")
    val restored = Multimodal.decodeFeatures(video, featureDim = 4)
      .orderBy("media_id").collect().map(_.getSeq[Float](3))
    assert(restored.toSeq === standIn.toSeq)
  }

  test("parseMeta: real container headers parsed (png/jpeg/gif/wav), unknown passthrough") {
    import spark.implicits._
    def png(w: Int, h: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(33)
      bb.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
      bb.putInt(13).put("IHDR".getBytes).putInt(w).putInt(h)
      bb.put(8.toByte).put(6.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      bb.array()
    }
    def jpeg(w: Int, h: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(2 + 8 + 2 + 2 + 7)
      bb.put(0xff.toByte).put(0xd8.toByte)                    // SOI
      bb.put(0xff.toByte).put(0xe0.toByte).putShort(6.toShort) // APP0 len 6
      bb.putInt(0x4a464946)                                    // "JFIF"
      bb.put(0xff.toByte).put(0xc0.toByte).putShort(9.toShort) // SOF0
      bb.put(8.toByte).putShort(h.toShort).putShort(w.toShort)
      bb.array()
    }
    def gif(w: Int, h: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(13).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("GIF89a".getBytes).putShort(w.toShort).putShort(h.toShort)
      bb.put(0.toByte).put(0.toByte).put(0.toByte)
      bb.array()
    }
    def wav(byteRate: Int, dataSize: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(36 + dataSize).put("WAVE".getBytes)
      bb.put("fmt ".getBytes).putInt(16).putShort(1.toShort).putShort(1.toShort)
        .putInt(8000).putInt(byteRate).putShort(2.toShort).putShort(16.toShort)
      bb.put("data".getBytes).putInt(dataSize).put(new Array[Byte](dataSize))
      bb.array()
    }
    val rows = Seq(
      (1L, png(640, 480)), (2L, jpeg(320, 200)), (3L, gif(99, 44)),
      (4L, wav(16000, 32000)), (5L, "not an image".getBytes))
    val df = Multimodal.fromBinary(rows.toDF("id", "payload"), "id", "payload", "image")
    val metas = Multimodal.parseMeta(df).orderBy("media_id").collect()
      .map(r => r.getLong(0) -> r.getStruct(3)).toMap
    assert(metas(1L).getString(0) === "png" && metas(1L).getInt(1) === 640 && metas(1L).getInt(2) === 480)
    assert(metas(2L).getString(0) === "jpeg" && metas(2L).getInt(1) === 320 && metas(2L).getInt(2) === 200)
    assert(metas(3L).getString(0) === "gif" && metas(3L).getInt(1) === 99 && metas(3L).getInt(2) === 44)
    assert(metas(4L).getString(0) === "wav" && metas(4L).getLong(3) === 2000L) // 32000B / 16000B-per-s
    assert(metas(5L).getString(0) === "raw") // unknown keeps fromBinary's meta
  }

  test("resizeStub: length contract, determinism, passthrough schema") {
    val resized = Multimodal.resizeStub(media, factor = 4)
    assert(resized.schema === media.schema)
    val pairs = media.orderBy("media_id").collect()
      .zip(resized.orderBy("media_id").collect())
    for ((orig, res) <- pairs) {
      val ob = orig.getAs[Array[Byte]]("content")
      val rb = res.getAs[Array[Byte]]("content")
      assert(rb.length === (ob.length + 3) / 4)
      assert(rb(0) === ob(0)) // every 4th byte kept, starting at 0
    }
  }

  test("real JDK decode: image luminance histogram + wav RMS envelope + real resize") {
    import spark.implicits._
    // a real PNG: left half black, right half white
    def pngBytes(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // a real 16-bit PCM WAV: silence then a loud square wave
    def wavBytes(nSamples: Int): Array[Byte] = {
      val rate = 8000
      val data = new Array[Byte](nSamples * 2)
      for (i <- nSamples / 2 until nSamples) {
        val v: Short = if (i % 2 == 0) 20000 else -20000
        data(2 * i) = (v & 0xff).toByte
        data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, nSamples.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val rows = Seq(
      (1L, "image", pngBytes(64, 32)),
      (2L, "audio", wavBytes(8000)),
      (3L, "image", "definitely not an image".getBytes)) // fallback path
    // fromBinary fixes ONE modality for the whole frame; this fixture needs
    // per-row modalities, so build the canonical schema directly
    val media2 = rows.toDF("media_id", "modality", "content")
      .withColumn("meta", struct(lit("raw").as("format"),
        lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms")))
    val feats = Multimodal.decodeFeatures(media2, featureDim = 4)
      .collect().map(r => r.getAs[Long]("media_id") ->
        r.getAs[scala.collection.Seq[Float]]("features")).toMap

    // image: half black half white -> mass only in darkest + brightest buckets
    val img = feats(1L)
    assert(math.abs(img.sum - 1f) < 1e-4, s"histogram not normalized: $img")
    assert(img(0) > 0.45f && img(3) > 0.45f && img(1) < 0.05f, s"histogram wrong: $img")
    // audio: first half silent, second half loud -> RMS envelope ramps up
    val aud = feats(2L)
    assert(aud(0) < 0.01f && aud(3) > 0.5f, s"rms envelope wrong: $aud")
    // undecodable image falls back to the deterministic byte-fold
    val expectFold = {
      val acc = new Array[Float](4)
      "definitely not an image".getBytes.zipWithIndex.foreach { case (b, i) =>
        acc(i % 4) += (b & 0xff) / 255.0f }
      acc
    }
    assert(feats(3L).toArray === expectFold)

    // real resize: 64x32 -> maxDim 16 preserves aspect (16x8), re-decodable
    val resized = Multimodal.resizeImages(media2, maxDim = 16)
      .filter(col("media_id") === 1L).head()
    val outBytes = resized.getAs[Array[Byte]]("content")
    val outImg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(outBytes))
    assert(outImg.getWidth === 16 && outImg.getHeight === 8)
    val meta = resized.getStruct(resized.fieldIndex("meta"))
    assert(meta.getString(0) === "png" && meta.getInt(1) === 16 && meta.getInt(2) === 8)
    // non-image payloads pass through the image resize unchanged
    val untouched = Multimodal.resizeImages(media2, maxDim = 16)
      .filter(col("media_id") === 3L).head().getAs[Array[Byte]]("content")
    assert(new String(untouched) === "definitely not an image")
  }

  test("subwordCountEstimate >= whitespace token count; counts case/digit splits") {
    import spark.implicits._
    val df = Seq("plainwords here", "camelCase word42x").toDF("t").select(
      graft.ext.TextAnalysis.tokenCount(col("t")).as("tc"),
      graft.ext.TextAnalysis.subwordCountEstimate(col("t")).as("sc"))
    val rows = df.collect()
    assert(rows(0).getInt(1) === rows(0).getInt(0))      // no intra-word splits
    assert(rows(1).getInt(1) > rows(1).getInt(0))        // camelCase + digits split
  }

  test("sampleFrames: every stride-th block, correct sizes") {
    val bin = media.limit(3)
    val frames = Multimodal.sampleFrames(bin, blockSize = 16, stride = 2)
    val rows = frames.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Array[Byte]]("frame_bytes").length <= 16))
    // frame count = ceil(nBlocks / stride)
    val contentLens = bin.select(col("media_id"), length(col("content")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byId = rows.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    for ((id, len) <- contentLens) {
      val nBlocks = math.ceil(len / 16.0).toInt
      val expect = (0 until nBlocks).count(_ % 2 == 0)
      assert(byId(id) === expect, s"media $id")
    }
  }

  test("AVI video decode end-to-end: synthesized 8-frame clip (MJPEG + raw " +
      "DIB), container sniff, luminance separation, corrupt fallback") {
    import java.io.ByteArrayOutputStream
    def le32(v: Long): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val o = new ByteArrayOutputStream()
      o.write(id.getBytes("US-ASCII")); o.write(le32(body.length))
      o.write(body)
      if (body.length % 2 == 1) o.write(0) // word alignment pad
      o.toByteArray
    }
    def list(tpe: String, bodies: Array[Byte]*): Array[Byte] = {
      val inner = new ByteArrayOutputStream()
      inner.write(tpe.getBytes("US-ASCII")); bodies.foreach(inner.write)
      chunk("LIST", inner.toByteArray)
    }
    def avih(w: Int, h: Int, usPerFrame: Long, nFrames: Long): Array[Byte] = {
      val b = new Array[Byte](56)
      def put(off: Int, v: Long): Unit = System.arraycopy(le32(v), 0, b, off, 4)
      put(0, usPerFrame); put(16, nFrames); put(32, w); put(36, h)
      chunk("avih", b)
    }
    def jpegFrame(w: Int, h: Int, shade: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (shade << 16) | (shade << 8) | shade
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val o = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", o)
      chunk("00dc", o.toByteArray)
    }
    def dibFrame(w: Int, h: Int, shade: Int): Array[Byte] =
      chunk("00db", Array.fill(w * h * 3)(shade.toByte))
    def avi(w: Int, h: Int, frames: Array[Byte]*): Array[Byte] = {
      val hdrl = list("hdrl", avih(w, h, 40000L, frames.length.toLong))
      val movi = list("movi", frames: _*)
      val o = new ByteArrayOutputStream()
      o.write("RIFF".getBytes("US-ASCII"))
      val payload = new ByteArrayOutputStream()
      payload.write("AVI ".getBytes("US-ASCII"))
      payload.write(hdrl); payload.write(movi)
      o.write(le32(payload.size().toLong)); o.write(payload.toByteArray)
      o.toByteArray
    }
    // 8 frames: 4 MJPEG + 4 raw DIB; dark clip (shade 16) vs bright (230)
    def clip(shade: Int) = avi(8, 6,
      (Seq.fill(4)(jpegFrame(8, 6, shade)) ++
        Seq.fill(4)(dibFrame(8, 6, shade))): _*)
    val dark = clip(16)
    val bright = clip(230)

    // container parse law: 8 frames, dims + duration from avih
    val parsed = Multimodal.parseAvi(dark).get
    assert(parsed.frames.length === 8)
    assert(parsed.width === 8 && parsed.height === 6)
    assert(parsed.totalFrames === 8L && parsed.usecPerFrame === 40000L)

    // sniffMeta: avi format, dims, duration = 8 * 40ms = 320ms
    assert(Multimodal.sniffMeta(dark) === Some(("avi", 8, 6, 320L)))

    import spark.implicits._
    val df = Seq((1L, dark), (2L, bright),
        (3L, "not a video at all".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    Multimodal.registerDecoder("video", Multimodal.AviDecoder)
    try {
      val vids = Multimodal.fromBinary(df, "media_id", "payload", "video")
      val out = Multimodal.decodeFeatures(Multimodal.parseMeta(vids),
          featureDim = 8)
        .select("media_id", "features").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
      // every histogram sums to ~1 per decodable clip
      assert(math.abs(out(1L).sum - 1f) < 1e-4, out(1L))
      assert(math.abs(out(2L).sum - 1f) < 1e-4, out(2L))
      // luminance separation: the dark clip's mass sits in LOW buckets,
      // the bright clip's in HIGH buckets (shade 16 -> bucket 0, 230 -> 7;
      // JPEG is lossy so allow neighbor-bucket leakage, not exact pinning)
      assert(out(1L).take(2).sum > 0.9f, s"dark clip: ${out(1L)}")
      assert(out(2L).drop(6).sum > 0.9f, s"bright clip: ${out(2L)}")
      // undecodable payload falls back to the byte-fold stand-in (same
      // values as calling it directly) instead of failing the stage
      val stub = Multimodal.stubFeatures("not a video at all".getBytes("UTF-8"), 8)
      assert(out(3L).toArray === stub)
    } finally Multimodal.unregisterDecoder("video")
  }
}
