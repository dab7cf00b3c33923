package graft

import graft.pipeline.Hive2Es
import graft.pipeline.Hive2Es.GraftConfig
import java.nio.file.Files
import org.apache.spark.sql.functions._

/**
 * S1 closure: the reference reads NAMED tables through a metastore
 * (`Hive2ES.scala:41` spark.read.table + where string). These tests drive
 * the same surface against a PARTITIONED managed table in the session
 * catalog: named-table scan, raw-SQL where, catalog-level partition pruning
 * (the scan must read only matching partition directories), and the whole
 * pipeline from table name to bundles.
 */
class MetastoreScanSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("partitioned managed table: where-string prunes partitions at the scan") {
    sf("sf0.001", "orders")
      .write.mode("overwrite").partitionBy("o_orderstatus")
      .saveAsTable("graft_orders_part")

    val cfg = GraftConfig(input = "graft_orders_part", outDir = "unused",
      indexName = "idx", where = "o_orderstatus = 'F' AND o_totalprice > 1000")
    val df = Hive2Es.read(spark, cfg)

    val p = plan(df)
    assert(p.contains("PartitionFilters") &&
      p.replaceAll("\\s+", " ").matches(".*PartitionFilters: \\[[^\\]]*o_orderstatus[^\\]]*\\].*"),
      s"partition filter not pushed to scan:\n$p")
    // the non-partition predicate must ALSO reach the reader
    assert(p.contains("PushedFilters") && p.contains("o_totalprice"),
      s"data filter not pushed:\n$p")

    val expected = sf("sf0.001", "orders")
      .filter("o_orderstatus = 'F' AND o_totalprice > 1000").count()
    assert(df.count() === expected)

    // catalog knows the partitions; exactly one survives pruning
    val parts = spark.sql("SHOW PARTITIONS graft_orders_part").collect().map(_.getString(0))
    assert(parts.length >= 3, s"expected >=3 partitions, got ${parts.toSeq}")
    val scanned = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(!scanned.contains("o_orderstatus=O"),
      s"pruned partition still scanned:\n$scanned")
  }

  test("full pipeline from a named partitioned table") {
    val out = Files.createTempDirectory("graft-metastore").toString
    val cfg = GraftConfig(input = "graft_orders_part", outDir = out,
      indexName = "idx_f", numShards = 3, where = "o_orderstatus = 'F'",
      id = "o_orderkey", routing = "o_custkey", repartition = true,
      partitionMultiples = 2)
    val res = Hive2Es.runGeneric(spark, cfg)
    val expected = sf("sf0.001", "orders").filter("o_orderstatus = 'F'").count()
    assert(res.totalDocs === expected)
    assert(res.shardCounts.keySet === Set(0, 1, 2))
  }

  test("appended partition is visible to subsequent named-table reads") {
    val base = sf("sf0.001", "orders").limit(50)
      .withColumn("o_orderstatus", lit("Z"))
    base.write.mode("append").partitionBy("o_orderstatus")
      .saveAsTable("graft_orders_part")
    val cfg = GraftConfig(input = "graft_orders_part", outDir = "unused",
      indexName = "idx", where = "o_orderstatus = 'Z'")
    assert(Hive2Es.read(spark, cfg).count() === 50)
    val parts = spark.sql("SHOW PARTITIONS graft_orders_part").collect().map(_.getString(0))
    assert(parts.exists(_.contains("o_orderstatus=Z")))
  }
}
