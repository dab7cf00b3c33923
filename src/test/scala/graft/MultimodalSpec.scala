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
}
