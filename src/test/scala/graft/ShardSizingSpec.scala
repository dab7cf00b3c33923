package graft

import graft.sink.ShardSizing

class ShardSizingSpec extends SparkSpec {

  val orders = sf("sf0.001", "orders")

  test("small input: 1 shard, fan-out covers task-size target") {
    val d = ShardSizing.suggest(orders)
    assert(d.numShards === 1, d)
    assert(d.partitionMultiples === 1, d)
    assert(d.estInputBytes > 0 && d.estDocBytes === d.estInputBytes * 3)
  }

  test("shard count scales linearly with target, clamped at maxShards") {
    // force tiny targets so the sf0.001 table spans many shards
    val d1 = ShardSizing.suggest(orders, targetShardBytes = 16 * 1024,
      targetTaskBytes = 16 * 1024)
    val d2 = ShardSizing.suggest(orders, targetShardBytes = 8 * 1024,
      targetTaskBytes = 8 * 1024)
    assert(d1.numShards > 1)
    // halving the per-shard target ~doubles the shard count (+-1 rounding)
    assert(math.abs(d2.numShards - 2 * d1.numShards) <= 2, s"$d1 vs $d2")
    val clamped = ShardSizing.suggest(orders, targetShardBytes = 64,
      maxShards = 7)
    assert(clamped.numShards === 7)
    assert(clamped.partitionMultiples <= 32)
  }

  test("catalog partition pruning shrinks the estimate (sizing sees pruned input)") {
    // metastore-backed tables (the reference's real input) prune in the
    // LOGICAL plan, so sizing sees it; plain path reads prune only at
    // execution and size as an upper bound (documented in ShardSizing)
    orders.write.mode("overwrite").partitionBy("o_orderstatus")
      .saveAsTable("graft_sizing_part")
    val part = spark.table("graft_sizing_part")
    val full = ShardSizing.suggest(part, targetShardBytes = 16 * 1024)
    val pruned = ShardSizing.suggest(
      part.where("o_orderstatus = 'F'"), targetShardBytes = 16 * 1024)
    assert(pruned.estInputBytes < full.estInputBytes,
      s"pruned ${pruned.estInputBytes} !< full ${full.estInputBytes}")
  }

  test("CLI parity: reference ArgsParser spellings work unchanged") {
    // a verbatim reference-style command line (deployment flags included)
    val (cfg, mode) = Main.parse(Array(
      "--hive-table", "db.events",
      "--hdfs-work-dir", "/tmp/wd",
      "--index-name", "events_20260812",
      "--type-name", "event",
      "--number-of-shards", "6",
      "--where", "dt = '20260812'",
      "--id", "event_id", "--routing", "user_id",
      "--partition-multiples", "5", "--repartition", "true",
      "--hive-input-fields", "event_id,user_id,value",
      "--bulk-actions", "100", "--bulk-size", "5",
      "--zookeeper", "zk1:2181", "--chroot", "/es_offline"))
    assert(cfg.input === "db.events")
    assert(cfg.outDir === "/tmp/wd")
    assert(cfg.indexName === "events_20260812")
    assert(cfg.typeName === "event")
    assert(cfg.numShards === 6)
    assert(cfg.where === "dt = '20260812'")
    assert(cfg.partitionMultiples === 5 && cfg.repartition)
    assert(cfg.hiveInputFields === Seq("event_id", "user_id", "value"))
    assert(mode === "infer") // reference PAHive2ES path is the default
  }

  test("--hive-input-fields prunes the scan to the listed columns") {
    val cfg = graft.pipeline.Hive2Es.GraftConfig(
      input = "/root/testdata/sf0.001/orders.parquet", outDir = "unused",
      indexName = "x", hiveInputFields = Seq("o_orderkey", "o_totalprice"))
    val df = graft.pipeline.Hive2Es.read(spark, cfg)
    assert(df.columns.toSeq === Seq("o_orderkey", "o_totalprice"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>"), p)
  }

  test("CLI: --num-shards auto parses to the sentinel; numbers still parse") {
    val (cfg, _) = Main.parse(Array("--input", "x", "--out", "y", "--index", "z",
      "--num-shards", "auto"))
    assert(cfg.numShards === -1)
    val (cfg2, _) = Main.parse(Array("--input", "x", "--out", "y", "--index", "z",
      "--num-shards", "12"))
    assert(cfg2.numShards === 12)
  }
}
