package graft

import graft.functions.EsMurmur3
import graft.sink.{BundleReader, BundleSink}
import graft.transform.DocTransform
import java.nio.file.Files
import org.apache.spark.sql.functions._

class BundleRoutingPruningSpec extends SparkSpec {

  def writeBundle(): String = {
    val out = Files.createTempDirectory("graft-prune").toString
    val docs = DocTransform.docs(sf("sf0.001", "orders"), "o_orderkey", Some("o_custkey"))
    BundleSink.write(docs, s"$out/idx", numShards = 5,
      partitionMultiples = 2, repartition = true, indexName = "idx")
    s"$out/idx"
  }

  test("routing point lookup prunes to the one matching shard directory") {
    val dir = writeBundle()
    val df = BundleReader.read(spark, dir)
    val routing = "42"
    val expectShard = EsMurmur3.shard(routing, 5)

    val q = df.filter(col("_routing") === routing)
    // the rule adds the implied _shard conjunct...
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains(s"_shard") && optimized.contains(s"= $expectShard)"),
      s"no shard conjunct in:\n$optimized")
    // ...and the scan's partition filters prune to one directory
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("PartitionFilters") && physical.contains("_shard"),
      s"no partition filter in:\n$physical")

    // correctness: same rows as a reader without the metadata tag
    val plain = spark.read.schema(graft.streaming.BundleStream.bundleSchema)
      .json(s"$dir/data").filter(col("_routing") === routing)
    assert(q.count() === plain.count())
    assert(q.count() > 0)
    // every returned row is on the computed shard
    assert(q.filter(col("_shard") =!= expectShard).count() === 0)
  }

  test("columnar bundle: format auto-detected, routing pruning still applies") {
    val out = Files.createTempDirectory("graft-prune-col").toString
    val docs = DocTransform.docsColumnar(sf("sf0.001", "orders"), "o_orderkey", Some("o_custkey"))
    BundleSink.write(docs, s"$out/idx", numShards = 5,
      partitionMultiples = 2, repartition = true, format = "columnar", indexName = "idx")
    assert(BundleReader.format(spark, s"$out/idx") === "columnar")
    val df = BundleReader.read(spark, s"$out/idx") // no format hint needed
    assert(df.columns.contains("o_totalprice"), df.columns.mkString(","))
    val routing = "42"
    val q = df.filter(col("_routing") === routing)
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("PartitionFilters") && physical.contains("_shard"), physical)
    assert(q.count() > 0)
    assert(q.filter(col("_shard") =!= EsMurmur3.shard(routing, 5)).count() === 0)
  }

  test("non-routing filters are left untouched") {
    val dir = writeBundle()
    val df = BundleReader.read(spark, dir)
    val q = df.filter(col("_id") === "17")
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("_shard ="), s"unexpected shard conjunct:\n$optimized")
    assert(q.count() === 1)
  }

  test("rule is idempotent (no duplicate conjuncts on re-optimization)") {
    val dir = writeBundle()
    val df = BundleReader.read(spark, dir)
    val q = df.filter(col("_routing") === "7")
    val optimized = q.queryExecution.optimizedPlan.toString
    val occurrences = "_shard#\\d+ = \\d+".r.findAllIn(optimized).length
    assert(occurrences === 1, s"expected exactly one shard conjunct:\n$optimized")
  }
}
