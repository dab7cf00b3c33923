package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** SURVEY.md §4.1 partition pruning claims, pinned:
  * static pruning from a literal predicate, and dynamic partition pruning
  * (DPP) where the pruning values come from the joined dimension side. */
class DynamicPruningSpec extends SparkSpec {

  def partitionedOrders(): String = {
    val dir = Files.createTempDirectory("graft-dpp").toString
    sf("sf0.001", "orders")
      .withColumn("order_year", year(col("o_orderdate")))
      .write.partitionBy("order_year").parquet(s"$dir/orders_p")
    s"$dir/orders_p"
  }

  test("static partition pruning: literal year filter scans one directory") {
    val path = partitionedOrders()
    val q = spark.read.parquet(path).filter(col("order_year") === 1995)
    val plan = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters") && plan.contains("order_year"), plan)
    assert(q.count() === sf("sf0.001", "orders")
      .filter(year(col("o_orderdate")) === 1995).count())
  }

  test("dynamic partition pruning: join-derived years prune the fact scan") {
    import spark.implicits._
    val path = partitionedOrders()
    val fact = spark.read.parquet(path)
    // DPP wants a filtered, file-backed dimension (a LocalRelation literal
    // list is folded away before the DPP rule looks for reusable filters)
    val dimPath = Files.createTempDirectory("graft-dpp-dim").toString
    (1990 to 2000).map(y => (y, if (y == 1995 || y == 1996) "keep" else "drop"))
      .toDF("dim_year", "tag")
      .write.parquet(s"$dimPath/dim")
    // the dim filter must be "likely selective" for DPP: an attr=literal
    // comparison (a bare boolean attribute gets simplified away and does
    // not qualify)
    val dim = spark.read.parquet(s"$dimPath/dim").filter(col("tag") === "keep")
    // at test scale the size-based benefit heuristic skips DPP; use the
    // fallback ratio path (real clusters pass the stats check naturally)
    val prev = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.useStats")
    val prevRatio = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio")
    try {
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "10000")
      val q = fact.join(dim, fact("order_year") === dim("dim_year"))
      val plan = q.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(plan.contains("dynamicpruning"), s"no DPP subquery in plan:\n$plan")
      assert(q.count() === sf("sf0.001", "orders")
        .filter(year(col("o_orderdate")).isin(1995, 1996)).count())
    } finally {
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", prev)
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", prevRatio)
    }
  }
}
