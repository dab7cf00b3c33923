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

  test("multi-index insert without _index is refused, not misplaced; OVERWRITE always refused") {
    val out = Files.createTempDirectory("graft-v2w-multi").toString
    val routed = DocTransform.docs(sf("sf0.001", "orders"), "o_orderkey", Some("o_custkey"))
      .withColumn("tier", lit("t0"))
    BundleSink.writeMulti(routed, s"$out/multi", "tier", numShards = 2,
      partitionMultiples = 2)
    // rows with no _index column cannot be routed — refused loudly, either
    // up front (require: no _index column) or, when Spark's V2 write
    // schema-aligns the frame and null-fills _index, by the in-job
    // raise_error (aborts before any staged file renames into data/)
    val e = intercept[Exception] {
      DocTransform.docs(sf("sf0.001", "region"), "r_regionkey", None)
        .write.format("graft-bundle").mode("append").save(s"$out/multi")
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("multi-index") || msg.contains("null/empty _index"),
      e.toString)
    // ...and nothing landed: both manifests still carry only the original rows
    val reports0 = BundleValidate.validateMulti(spark, s"$out/multi")
    assert(reports0.values.forall(_.ok), "refused insert must leave the bundle valid")
    // overwrite WITHOUT an _index column has nothing to scope the
    // truncation to — refused up front on the direct API
    val e2 = intercept[UnsupportedOperationException] {
      graft.sink.BundleSink.insertInto(
        DocTransform.docs(sf("sf0.001", "region"), "r_regionkey", None),
        s"$out/multi", overwrite = true)
    }
    assert(e2.getMessage.contains("OVERWRITE"))
  }

  test("multi-index overwrite: scoped to the _index values present; other indices untouched") {
    val out = Files.createTempDirectory("graft-v2w-mow").toString
    val root = s"$out/multi"
    val routed = DocTransform.docs(sf("sf0.001", "orders"), "o_orderkey", Some("o_custkey"))
      .withColumn("tier", concat(lit("t"), pmod(col("_id").cast("long"), lit(2))))
    val before = BundleSink.writeMulti(routed, root, "tier", numShards = 2,
      partitionMultiples = 2)
    // give t1 an append history so it has a CAS chain that must survive
    DocTransform.docs(sf("sf0.001", "customer"), "c_custkey", None)
      .withColumn("_index", lit("t1"))
      .write.format("graft-bundle").mode("append").save(root)
    def listDir(p: String): Seq[String] = {
      val d = java.nio.file.Paths.get(p)
      if (!java.nio.file.Files.exists(d)) Seq.empty
      else java.nio.file.Files.list(d).toArray.map(_.toString).toSeq.sorted
    }
    val t1CasBefore = listDir(s"$root/.manifest-cas_t1")
    val t1ManifestBefore = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$root/manifest_t1.json"))
    assert(t1CasBefore.nonEmpty, "precondition: t1 has a CAS chain")

    // scoped overwrite: t0 is truncated and replaced by exactly these rows
    DocTransform.docs(sf("sf0.001", "region"), "r_regionkey", None)
      .withColumn("_index", lit("t0"))
      .write.format("graft-bundle").mode("overwrite").save(root)

    val t0m = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$root/manifest_t0.json"))
    assert(graft.sources.BundleManifest.parseShardCounts(t0m).values.sum === 5,
      s"t0 must hold exactly the overwrite's rows: $t0m")
    assert(graft.sources.BundleManifest.versionOf(t0m) === 1,
      "overwrite must publish a fresh version-1 manifest")
    assert(listDir(s"$root/.manifest-cas_t0").isEmpty,
      "overwrite must reset t0's CAS chain")
    val t0rows = spark.read.json(s"$root/data/_index=t0")
    assert(t0rows.count() === 5)
    assert(t0rows.filter(col("_shard") =!=
      graft.functions.EsFunctions.es_shard(col("_routing"), 2)).count() === 0,
      "overwrite must recompute placement")

    // t1 byte-identical: data counts, manifest, CAS chain all untouched
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$root/manifest_t1.json")) === t1ManifestBefore)
    assert(listDir(s"$root/.manifest-cas_t1") === t1CasBefore)
    assert(spark.read.json(s"$root/data/_index=t1").count()
      === before("t1").totalDocs + 150)

    // the whole bundle still validates per index
    val reports = BundleValidate.validateMulti(spark, root)
    assert(reports.keySet === Set("t0", "t1") && reports.values.forall(_.ok),
      reports.map { case (i, r) => s"$i: ${r.problems}" }.mkString("; "))
  }

  test("multi-index append: _index routes rows, per-index manifest CAS, validateMulti green") {
    val out = Files.createTempDirectory("graft-v2w-mappend").toString
    val root = s"$out/multi"
    // tiered bundle: orders split across t0/t1 by key parity
    val routed = DocTransform.docs(sf("sf0.001", "orders"), "o_orderkey", Some("o_custkey"))
      .withColumn("tier", concat(lit("t"), pmod(col("_id").cast("long"), lit(2))))
    val before = BundleSink.writeMulti(routed, root, "tier", numShards = 2,
      partitionMultiples = 2)

    // append customers into t1 ONLY, through the connector path that used
    // to refuse — placement recomputed, only t1's manifest refreshed
    val extra = DocTransform.docs(sf("sf0.001", "customer"), "c_custkey", None)
      .withColumn("_index", lit("t1"))
      .withColumn("_shard", lit(0)) // hostile: must be ignored
    extra.write.format("graft-bundle").mode("append").save(root)

    val t0Counts = graft.sources.BundleManifest.parseShardCounts(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$root/manifest_t0.json")), "UTF-8"))
    val t1Counts = graft.sources.BundleManifest.parseShardCounts(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$root/manifest_t1.json")), "UTF-8"))
    assert(t0Counts.values.sum === before("t0").totalDocs,
      "untouched index's manifest must not change")
    assert(t1Counts.values.sum === before("t1").totalDocs + 150,
      "appended index's manifest must carry the delta")

    // every index validates against ITS manifest, placement included
    val reports = BundleValidate.validateMulti(spark, root)
    assert(reports.values.forall(_.ok),
      reports.map { case (i, r) => s"$i: ${r.problems}" }.mkString("; "))

    // appended rows are readable and correctly placed
    val t1 = spark.read.json(s"$root/data/_index=t1")
    assert(t1.count() === before("t1").totalDocs + 150)
    assert(t1.filter(col("_shard") =!=
      graft.functions.EsFunctions.es_shard(col("_routing"), 2)).count() === 0)

    // an unseen _index value auto-creates its manifest (new-tenant case)
    DocTransform.docs(sf("sf0.001", "region"), "r_regionkey", None)
      .withColumn("_index", lit("t9"))
      .write.format("graft-bundle").mode("append").save(root)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$root/manifest_t9.json")))
    val after = BundleValidate.validateMulti(spark, root)
    assert(after.size === 3 && after.values.forall(_.ok),
      after.map { case (i, r) => s"$i: ${r.problems}" }.mkString("; "))
  }

  test("multi-index append: pretty-printed manifests parse; unsafe _index values refused") {
    val out = Files.createTempDirectory("graft-v2w-mhard").toString
    val root = s"$out/multi"
    val routed = DocTransform.docs(sf("sf0.001", "orders"), "o_orderkey", Some("o_custkey"))
      .withColumn("tier", concat(lit("t"), pmod(col("_id").cast("long"), lit(2))))
    val before = BundleSink.writeMulti(routed, root, "tier", numShards = 2,
      partitionMultiples = 2)

    // externally reformatted manifest (pretty-printed, extra whitespace):
    // layout fields and base counts must parse identically — the regex
    // pluckers this replaced matched compact engine output only
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val t0Path = java.nio.file.Paths.get(s"$root/manifest_t0.json")
    val pretty = mapper.writerWithDefaultPrettyPrinter().writeValueAsString(
      mapper.readTree(java.nio.file.Files.readString(t0Path)))
    java.nio.file.Files.writeString(t0Path, pretty)
    // the out-of-band rewrite invalidates Hadoop LocalFS's checksum sidecar
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$root/.manifest_t0.json.crc"))
    assert(pretty.contains("\n  "), "precondition: manifest really is pretty-printed")

    val extra = DocTransform.docs(sf("sf0.001", "region"), "r_regionkey", None)
      .withColumn("_index", lit("t0"))
    extra.write.format("graft-bundle").mode("append").save(root)
    val t0Counts = graft.sources.BundleManifest.parseShardCounts(
      java.nio.file.Files.readString(java.nio.file.Paths.get(s"$root/manifest_t0.json")))
    assert(t0Counts.values.sum === before("t0").totalDocs + 5,
      "append onto a pretty-printed manifest must merge its base counts")
    val reports = BundleValidate.validateMulti(spark, root)
    assert(reports.values.forall(_.ok),
      reports.map { case (i, r) => s"$i: ${r.problems}" }.mkString("; "))

    // _index values become filesystem path segments: traversal/percent/
    // slash values are refused in-job, before any staged file renames
    for (evil <- Seq("../escape", "a/b", "a%2Fb", ".hidden", "idx\n")) {
      val e = intercept[Exception] {
        DocTransform.docs(sf("sf0.001", "region"), "r_regionkey", None)
          .withColumn("_index", lit(evil))
          .write.format("graft-bundle").mode("append").save(root)
      }
      val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains("unsafe _index") || msg.contains("unsafe index"),
        s"'$evil' must be refused as unsafe, got: $e")
    }
    // ...and the refused appends left the bundle untouched and valid
    val after = BundleValidate.validateMulti(spark, root)
    assert(after.keySet === Set("t0", "t1") && after.values.forall(_.ok),
      after.map { case (i, r) => s"$i: ${r.problems}" }.mkString("; "))
  }

  test("CLI --mode append --index-col routes source rows into a multi-index bundle") {
    val out = Files.createTempDirectory("graft-v2w-mcli").toString
    val root = s"$out/multi"
    val routed = DocTransform.docs(sf("sf0.001", "orders"), "o_orderkey", Some("o_custkey"))
      .withColumn("tier", lit("t0"))
    BundleSink.writeMulti(routed, root, "tier", numShards = 2,
      partitionMultiples = 2)
    // drive Main's append body the way the CLI does: parse, keep the index
    // column through DocTransform, rename to _index, insertInto
    val (cfg, mode) = Main.parse(Array("--mode", "append",
      "--input", "/root/testdata/sf0.001/nation.parquet",
      "--out", out, "--index", "multi", "--id", "n_nationkey",
      "--index-col", "tier"))
    assert(mode === "append")
    val raw = Main.rawFlags(Array("--mode", "append", "--index-col", "tier"))
    val src = spark.read.parquet(cfg.input).where(cfg.where)
      .withColumn("tier", concat(lit("t"), pmod(col("n_nationkey"), lit(2))))
    val docs = DocTransform.docs(src, cfg.id, Option(cfg.routing),
      keepCols = Seq(raw("index-col"))).withColumnRenamed(raw("index-col"), "_index")
    val res = BundleSink.insertInto(docs, s"${cfg.outDir}/${cfg.indexName}",
      overwrite = false)
    assert(res.totalDocs === 25L + 1500L, s"aggregate result off: $res")
    assert(BundleValidate.validateMulti(spark, root).values.forall(_.ok))
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
