package graft

import graft.functions.EsMurmur3
import graft.sink.BundleSink
import graft.transform.{DocTransform, SchemaInfer}
import java.nio.file.Files
import org.apache.spark.sql.functions._

/**
 * Golden-bundle fixture test (SURVEY.md §5.2.5 / FIXTURES.md §1): a
 * deterministic kline_daily-shaped dataset (the reference's one behavioral
 * fixture — daily stock k-lines routed by stock code into a 5-shard
 * `test_index`) is pushed through the full sink and structurally diffed
 * against the checked-in golden manifest (per-shard counts + mapping keys,
 * not byte equality).
 */
case class Kline(stock_code: String, trade_date: java.sql.Timestamp, dt: String,
                 open_price: Double, close_price: Double, high_price: Double,
                 low_price: Double, volume: Double, volume_total: Double)

class GoldenBundleSpec extends SparkSpec {
  import spark.implicits._

  def klineData: Seq[Kline] = (0 until 100).map { i =>
    val code = f"SH${600000 + i * 7}%06d"
    val day = f"201911${(i % 28) + 1}%02d"
    val ts = java.sql.Timestamp.valueOf(
      s"2019-11-${f"${(i % 28) + 1}%02d"} 00:00:00")
    val base = 7.0 + (i % 13) * 0.11
    Kline(code, ts, day, base, base + 0.04, base + 0.07, base - 0.05,
      (i % 97) / 100.0, i * 1000.0)
  }

  test("kline golden bundle: structural manifest match") {
    val out = Files.createTempDirectory("graft-golden").toString
    val df = klineData.toDF()
    val specs = SchemaInfer.infer(df)
    val docs = DocTransform.docs(df, "stock_code", Some("stock_code"))
    val res = BundleSink.write(docs, s"$out/test_index", numShards = 5,
      partitionMultiples = 2, repartition = true,
      mappingJson = Some(SchemaInfer.toMappingJson(specs)),
      indexName = "test_index")

    // golden structural expectations
    val golden = ujsonLite(Files.readString(
      java.nio.file.Paths.get(getClass.getResource("/golden/kline_manifest.json").toURI)))
    assert(res.totalDocs === golden("totalDocs").toLong)
    assert(res.numShards === golden("numShards").toInt)
    val goldenCounts = golden.shardCounts
    assert(res.shardCounts.map { case (k, v) => k.toString -> v } === goldenCounts)
    // mapping keys match the kline document schema
    val mappingKeys = specs.map(_.esKey).sorted
    assert(mappingKeys === golden.mappingKeys)
    // independent placement law on the golden keys
    val expected = klineData.groupBy(k => EsMurmur3.shard(k.stock_code, 5))
      .view.mapValues(_.size.toLong).toMap
    assert(res.shardCounts === expected)
    // manifest structural completeness: deployment-contract fields present
    // even when unset (alias null, empty finalSettings), shard_state rides
    // alongside
    val manifest = Files.readString(
      java.nio.file.Paths.get(s"$out/test_index/manifest.json"))
    assert(manifest.contains("\"alias\":") && manifest.contains("\"finalSettings\":"),
      manifest)
    assert(Files.exists(java.nio.file.Paths.get(s"$out/test_index/shard_state.json")))
    // date fields serialized yyyyMMdd like the fixture documents
    val sample = spark.read.json(s"$out/test_index/data")
      .select(get_json_object(col("doc"), "$.trade_date").as("td")).head().getString(0)
    assert(sample.matches("""201911\d\d"""), s"trade_date '$sample' not yyyyMMdd")
  }

  /** minimal golden-json accessor (avoids a json dep in tests) */
  case class ujsonLite(raw: String) {
    def apply(key: String): String =
      s""""$key":([0-9]+)""".r.findFirstMatchIn(raw).get.group(1)
    def shardCounts: Map[String, Long] =
      """"shardCounts":\{([^}]*)\}""".r.findFirstMatchIn(raw).get.group(1)
        .split(",").map { kv =>
          val Array(k, v) = kv.split(":")
          k.replaceAll("\"", "") -> v.toLong
        }.toMap
    def mappingKeys: Seq[String] =
      """"mappingKeys":\[([^\]]*)\]""".r.findFirstMatchIn(raw).get.group(1)
        .split(",").map(_.replaceAll("\"", "")).toSeq
  }
}
