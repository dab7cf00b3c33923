package graft

import graft.sink.{BundleCompact, BundleSink}
import graft.streaming.BundleStream
import graft.transform.DocTransform
import java.nio.file.Files
import org.apache.spark.sql.functions._

class BundleCompactSpec extends SparkSpec {

  test("compaction: many small batch files -> filesPerShard, counts preserved, reads intact") {
    val dir = Files.createTempDirectory("graft-compact").toString
    val docs = DocTransform.docs(sf("sf0.001", "orders"), "o_orderkey", Some("o_custkey"))
    BundleSink.write(docs, s"$dir/idx", 3, 2, repartition = true)
    // simulate streaming fragmentation: several extra batch commits
    for (b <- 1 to 4)
      graft.streaming.BundleStreamWriter.commitBatch(
        DocTransform.docs(sf("sf0.001", "customer"), "c_custkey", None),
        b.toLong, s"$dir/idx", 3)
    val preCount = spark.read.schema(BundleStream.bundleSchema)
      .json(s"$dir/idx/data").count()

    val r = BundleCompact.compact(spark, s"$dir/idx", filesPerShard = 1)
    assert(r.docs === preCount)
    assert(r.filesAfter < r.filesBefore)
    assert(r.filesAfter <= 3L * 2) // ~filesPerShard per shard (hash collisions may split)

    val back = spark.read.schema(BundleStream.bundleSchema).json(s"$dir/idx/data")
    assert(back.count() === preCount)
    // placement still holds after the rewrite
    val misplaced = back.filter(col("_shard") =!=
      graft.functions.EsFunctions.es_shard(col("_routing"), 3)).count()
    assert(misplaced === 0L)
    // no leftover staging dirs
    assert(!Files.exists(java.nio.file.Paths.get(s"$dir/idx/data-compacting")))
    assert(!Files.exists(java.nio.file.Paths.get(s"$dir/idx/data-precompact")))
  }
}
