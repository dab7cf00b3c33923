package graft

import graft.sink.{BundleSink, BundleValidate}
import graft.sources.BundleManifest
import graft.streaming.BundleStream
import graft.transform.DocTransform
import java.nio.file.Files
import org.apache.spark.sql.functions._

/**
 * Connector write path: `df.write.format("graft-bundle")` must uphold the
 * same three invariants as [[BundleSink]] — placement derived from
 * `_routing`, manifest/shard_state consistent with the data, commit through
 * staging (never live files in the data dir) — because the whole point of
 * routing writes through the table is that a user CANNOT corrupt a bundle
 * with a DataFrame write.
 */
class BundleWriteV2Spec extends SparkSpec {

  private def mkBundle(format: String = "json"): (String, BundleSink.Result) = {
    val out = Files.createTempDirectory("graft-v2w").toString
    val docs = DocTransform.docs(sf("sf0.001", "orders"), "o_orderkey", Some("o_custkey"))
    val res = BundleSink.write(docs, s"$out/idx", numShards = 3,
      partitionMultiples = 2, repartition = true, format = format,
      indexName = "idx")
    (s"$out/idx", res)
  }

  test("append: placement recomputed, manifest + state refreshed, old rows intact") {
    val (dir, before) = mkBundle()
    val extra = DocTransform.docs(sf("sf0.001", "customer"), "c_custkey", None)
      // a HOSTILE _shard column: every row claims shard 0 — the write path
      // must ignore it and place by _routing
      .withColumn("_shard", lit(0))
    extra.write.format("graft-bundle").mode("append").save(dir)

    val back = spark.read.format("graft-bundle").load(dir)
    assert(back.count() === before.totalDocs + 150)
    val misplaced = back.filter(
      col("_shard") =!= graft.functions.EsFunctions.es_shard(col("_routing"), 3)).count()
    assert(misplaced === 0L, "appended rows must be placed by _routing")
    // manifest counts = prior + delta, agreeing with the data
    val counts = BundleManifest.shardCounts(spark, dir).get
    assert(counts.values.sum === before.totalDocs + 150)
    val actual = back.groupBy("_shard").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.filter(_._2 > 0) === actual)
    // the refreshed bundle still passes the install-time validator
    assert(BundleValidate.validate(spark, dir).ok)
    // no staging remnants
    assert(!new java.io.File(s"$dir/.staging").exists())
  }

  test("append works on parquet bundles in the bundle's own format/codec") {
    val (dir, before) = mkBundle(format = "parquet")
    DocTransform.docs(sf("sf0.001", "region"), "r_regionkey", None)
      .write.format("graft-bundle").mode("append").save(dir)
    val back = spark.read.format("graft-bundle").load(dir)
    assert(back.count() === before.totalDocs + 5)
    assert(BundleValidate.validate(spark, dir).ok)
  }

  test("overwrite: full rewrite under the commit protocol, fresh manifest") {
    val (dir, _) = mkBundle()
    val repl = DocTransform.docs(sf("sf0.001", "region"), "r_regionkey", None)
    repl.write.format("graft-bundle").mode("overwrite").save(dir)
    val back = spark.read.schema(BundleStream.bundleSchema).json(s"$dir/data")
    assert(back.count() === 5)
    assert(BundleManifest.shardCounts(spark, dir).get.values.sum === 5)
    assert(BundleValidate.validate(spark, dir).ok)
  }

  test("catalog DDL: INSERT INTO goes through the bundle contract, not raw files") {
    // regression pin: as a FileTable, BundleTable's SQL inserts were
    // rewritten by FallBackFileSourceV2 into InsertIntoHadoopFsRelationCommand
    // — raw files, hostile _shard honored, manifest stale
    val (dir, before) = mkBundle()
    spark.sql(s"CREATE TABLE bt_v2w USING `graft-bundle` LOCATION '$dir'")
    try {
      val insert = spark.sessionState.executePlan(spark.sessionState.sqlParser
        .parsePlan("INSERT INTO bt_v2w SELECT '9', '9', '{}', 0")).analyzed
      assert(insert.toString.contains("AppendData"),
        s"catalog insert must stay on the V2 path, got: $insert")
      spark.sql("INSERT INTO bt_v2w SELECT '9' as _id, '9' as _routing, '{}' as doc, 0 as _shard")
      val back = spark.read.format("graft-bundle").load(dir)
      assert(back.count() === before.totalDocs + 1)
      // hostile _shard ignored; manifest agrees with the data
      assert(back.filter(col("_shard") =!=
        graft.functions.EsFunctions.es_shard(col("_routing"), 3)).count() === 0L)
      assert(BundleManifest.shardCounts(spark, dir).get.values.sum ===
        before.totalDocs + 1)
      // catalog reads still answer after the contract-path insert
      assert(spark.sql("SELECT count(*) FROM bt_v2w").head().getLong(0) ===
        before.totalDocs + 1)
      // INSERT OVERWRITE truncates through the same contract
      spark.sql("INSERT OVERWRITE bt_v2w SELECT 'only' as _id, 'only' as _routing, '{}' as doc, 0 as _shard")
      assert(spark.sql("SELECT count(*) FROM bt_v2w").head().getLong(0) === 1L)
      assert(BundleManifest.shardCounts(spark, dir).get.values.sum === 1L)
      // rows without _routing are rejected with the contract's message
      val err = intercept[Exception] {
        spark.range(1).selectExpr("'x' _id", "'{}' doc")
          .write.format("graft-bundle").mode("append").save(dir)
      }
      assert(err.getMessage.contains("_routing"))
    } finally spark.sql("DROP TABLE bt_v2w")
  }

  test("insert into a multi-index bundle is refused, not misplaced") {
    val out = Files.createTempDirectory("graft-v2w-multi").toString
    val routed = DocTransform.docs(sf("sf0.001", "orders"), "o_orderkey", Some("o_custkey"))
      .withColumn("tier", lit("t0"))
    BundleSink.writeMulti(routed, s"$out/multi", "tier", numShards = 2,
      partitionMultiples = 2)
    val e = intercept[UnsupportedOperationException] {
      DocTransform.docs(sf("sf0.001", "region"), "r_regionkey", None)
        .write.format("graft-bundle").mode("append").save(s"$out/multi")
    }
    assert(e.getMessage.contains("multi-index"))
  }

  test("CLI --mode append: docs built from source rows, appended under the contract") {
    val (dir, before) = mkBundle()
    // drive Main's append body the way the CLI does (parse + the same
    // DocTransform -> insertInto composition), against the real bundle
    val (cfg, mode) = Main.parse(Array("--mode", "append",
      "--input", "/root/testdata/sf0.001/customer.parquet",
      "--out", new java.io.File(dir).getParent, "--index",
      new java.io.File(dir).getName, "--id", "c_custkey"))
    assert(mode === "append")
    val src = spark.read.parquet(cfg.input).where(cfg.where)
    val res = BundleSink.insertInto(
      DocTransform.docs(src, cfg.id, Option(cfg.routing)),
      s"${cfg.outDir}/${cfg.indexName}", overwrite = false)
    assert(res.totalDocs === before.totalDocs + 150)
    assert(BundleValidate.validate(spark, dir).ok)
  }

  test("catalog relation: predicate classes agree with the connector read") {
    // BundleCatalogRelation re-expresses pushed Filters as Columns for the
    // inner V2 read; Spark re-checks everything above, so this pins
    // RESULTS (not plans) across the predicate classes toColumn handles —
    // equality, range, IN, null checks, string ops, AND/OR/NOT
    val (dir, _) = mkBundle()
    spark.sql("DROP TABLE IF EXISTS bt_preds")
    spark.sql(s"CREATE TABLE bt_preds USING `graft-bundle` LOCATION '$dir'")
    try {
      val preds = Seq(
        "_shard = 1",
        "_shard >= 1 AND _shard < 3",
        "_routing IN ('1', '7', '12')",
        "_id IS NOT NULL",
        "_routing LIKE '1%'",
        "NOT (_shard = 0) OR _routing = '1'")
      val direct = spark.read.format("graft-bundle").load(dir)
      for (p <- preds) {
        val viaCatalog = spark.sql(s"SELECT _id FROM bt_preds WHERE $p")
          .collect().map(_.getString(0)).sorted.toSeq
        val viaConnector = direct.where(p).select("_id")
          .collect().map(_.getString(0)).sorted.toSeq
        assert(viaCatalog === viaConnector, s"predicate diverged: $p")
        assert(viaCatalog.nonEmpty, s"degenerate (empty) predicate case: $p")
      }
    } finally spark.sql("DROP TABLE IF EXISTS bt_preds")
  }

  test("append to an unsealed streaming bundle fails loudly") {
    val dir = Files.createTempDirectory("graft-v2w-stream").toString
    val src = s"$dir/in"
    val docs = DocTransform.docs(sf("sf0.001", "region"), "r_regionkey", None)
    docs.write.parquet(src)
    val q = graft.streaming.BundleStreamWriter.start(
      spark.readStream.schema(docs.schema).parquet(src), s"$dir/out", 2,
      s"$dir/ckpt", availableNow = true)
    q.awaitTermination(120000)
    // state:"streaming", no shardCounts yet — INSERT must not guess
    val e = intercept[IllegalStateException] {
      docs.write.format("graft-bundle").mode("append").save(s"$dir/out")
    }
    assert(e.getMessage.contains("shardCounts"))
    // after sealing, the same append succeeds
    graft.streaming.BundleStreamWriter.seal(spark, s"$dir/out", 2)
    docs.withColumn("_id", concat(lit("x"), col("_id")))
      .write.format("graft-bundle").mode("append").save(s"$dir/out")
    assert(BundleManifest.shardCounts(spark, s"$dir/out").get.values.sum === 10)
  }
}
