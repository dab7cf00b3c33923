package graft

import graft.operators.SkewJoin
import java.nio.file.Files
import org.apache.spark.sql.functions._

class SkewAndBucketSpec extends SparkSpec {
  import spark.implicits._

  // skewed probe: key 0 holds half the rows
  def skewedProbe = spark.range(0, 10000)
    .select(when(col("id") % 2 === 0, 0L).otherwise(col("id") % 50).as("k"),
      col("id").as("v"))
  def smallBuild = spark.range(0, 50).select(col("id").as("k"),
    concat(lit("dim"), col("id")).as("name"))

  test("saltedEquiJoin: identical result to plain join, spread over salts") {
    val plain = skewedProbe.join(smallBuild, Seq("k"), "inner")
      .groupBy("k").agg(count(lit(1)).as("c"), sum("v").as("s"))
    val salted = SkewJoin.saltedEquiJoin(skewedProbe, smallBuild, "k", salts = 8)
      .groupBy("k").agg(count(lit(1)).as("c"), sum("v").as("s"))
    assert(plain.orderBy("k").collect().toSeq === salted.orderBy("k").collect().toSeq)
  }

  test("saltedEquiJoin: left join preserves unmatched probe rows") {
    val probe = Seq((1L, "a"), (99L, "b")).toDF("k", "x")
    val build = Seq((1L, "dim")).toDF("k", "name")
    val out = SkewJoin.saltedEquiJoin(probe, build, "k", 4, "left")
      .orderBy("k").collect()
    assert(out.length === 2)
    assert(out(1).isNullAt(2)) // k=99 kept with null name
  }

  test("hybridSkewJoin: equals plain join on skewed data") {
    val plain = skewedProbe.join(smallBuild, Seq("k"), "inner")
      .groupBy("k").agg(count(lit(1)).as("c"))
    val hybrid = SkewJoin.hybridSkewJoin(skewedProbe, smallBuild, "k", threshold = 1000)
      .groupBy("k").agg(count(lit(1)).as("c"))
    assert(plain.orderBy("k").collect().toSeq === hybrid.orderBy("k").collect().toSeq)
  }

  test("heavyHitters finds the whale key first") {
    val top = SkewJoin.heavyHitters(skewedProbe, "k", 3).collect()
    assert(top.head.getLong(0) === 0L)
  }

  test("pickSalts: scales with the whale, 1 on uniform data, sample-aware") {
    // whale key 0 has 5000 rows; target 1000/bucket -> 5 salts
    assert(SkewJoin.pickSalts(skewedProbe, "k", targetRowsPerBucket = 1000) === 5)
    // uniform distribution under the target -> no salting
    val uniform = spark.range(0, 1000).select((col("id") % 100).as("k"))
    assert(SkewJoin.pickSalts(uniform, "k", targetRowsPerBucket = 1000) === 1)
    // clamped by maxSalts
    assert(SkewJoin.pickSalts(skewedProbe, "k",
      targetRowsPerBucket = 10, maxSalts = 16) === 16)
    // sampled profile lands in the right ballpark (estimate scales by 1/f)
    val sampled = SkewJoin.pickSalts(skewedProbe, "k",
      targetRowsPerBucket = 1000, sampleFraction = 0.5)
    assert(sampled >= 3 && sampled <= 7, s"sampled estimate off: $sampled")
  }

  test("autoSaltedJoin equals plain join on both skewed and uniform data") {
    val plain = skewedProbe.join(smallBuild, Seq("k"), "inner")
      .groupBy("k").agg(count(lit(1)).as("c"), sum("v").as("s"))
    val auto = SkewJoin.autoSaltedJoin(skewedProbe, smallBuild, "k",
        targetRowsPerBucket = 1000)
      .groupBy("k").agg(count(lit(1)).as("c"), sum("v").as("s"))
    assert(plain.orderBy("k").collect().toSeq === auto.orderBy("k").collect().toSeq)
  }

  test("bucketed tables: co-located join plans without a shuffle") {
    val o = sf("sf0.001", "orders")
    val c = sf("sf0.001", "customer")
    o.write.mode("overwrite").bucketBy(8, "o_custkey")
      .sortBy("o_custkey").saveAsTable("graft_orders_b")
    c.write.mode("overwrite").bucketBy(8, "c_custkey")
      .sortBy("c_custkey").saveAsTable("graft_cust_b")
    // disable auto-broadcast so the planner picks SMJ, where bucketing
    // removes both shuffle exchanges (broadcast would bypass bucketing)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("graft_orders_b")
        .join(spark.table("graft_cust_b"),
          col("o_custkey") === col("c_custkey"))
      val planned = j.queryExecution.executedPlan.toString
      assert(planned.contains("SortMergeJoin"), s"expected SMJ:\n$planned")
      assert(!planned.contains("ShuffleExchange") && !planned.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$planned")
      assert(j.count() === o.join(c, o("o_custkey") === c("c_custkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
