package graft

import graft.queries.Queries

class QueriesSpec extends SparkSpec {

  test("every query runs at sf0.001 and returns rows (driver smoke shape)") {
    val dir = "/root/testdata/sf0.001"
    for (q <- Queries.all) {
      val n = q.build(spark, dir).count()
      assert(n > 0, s"${q.name} returned no rows at sf0.001")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
    assert(SparkEntry.queries.keySet === Queries.all.map(_.name).toSet)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("approx_percentile within 2% of exact (q51); sample deterministic and in bounds (q52)") {
    val dir = "/root/testdata/sf0.01"
    val q51 = Queries.all.find(_.name == "q51_approx_quantile").get.build(spark, dir).collect()
    for (r <- q51) {
      // columns: l_returnflag, approx_p50, approx_p95, exact_p50, exact_p95
      Seq((1, 3), (2, 4)).foreach { case (ai, ei) =>
        val a = r.getDouble(ai); val e = r.getDouble(ei)
        assert(math.abs(a - e) / e < 0.02, s"approx $a vs exact $e") }
    }
    val q52 = Queries.all.find(_.name == "q52_sample").get
    val n1 = q52.build(spark, dir).head().getLong(0)
    val n2 = q52.build(spark, dir).head().getLong(0)
    assert(n1 === n2, "seeded sample not deterministic")
    // binomial bounds: 10% of 60k +- 5 sigma
    val total = sf("sf0.01", "lineitem").count().toDouble
    val sigma = math.sqrt(total * 0.1 * 0.9)
    assert(math.abs(n1 - total * 0.1) < 5 * sigma, s"sample size $n1 out of bounds")
  }

  test("approx_count_distinct within 5% of exact (q33)") {
    val r = Queries.all.find(_.name == "q33_approx_distinct").get
      .build(spark, "/root/testdata/sf0.01").head()
    val approx = r.getLong(0).toDouble
    val exact = r.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx $approx vs exact $exact")
  }

  test("count-min sketch estimates within eps*N of exact counts (q61 family)") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.01"
    val li = graft.Tables.load(spark, dir, "lineitem")
    val bytes = li.agg(expr("count_min_sketch(l_returnflag, 0.01d, 0.99d, 42)"))
      .head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(bytes))
    val exact = li.groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    for ((flag, cnt) <- exact) {
      val est = cms.estimateCount(flag)
      assert(est >= cnt && est <= cnt + (0.01 * n).toLong + 1,
        s"CMS estimate $est for $flag outside [$cnt, cnt+eps*N]")
    }
    // q61 runs end-to-end and flags the heavy hitter
    val q61 = Queries.all.find(_.name == "q61_freq_sketch").get
      .build(spark, dir).head()
    assert(q61.getString(1).split(",").contains("N"), q61.toString)
  }

  test("HLL sketch union estimate within 5% of exact; doc_ids disjoint -> sum law (q55)") {
    val r = Queries.all.find(_.name == "q55_hll_sketch").get
      .build(spark, "/root/testdata/sf0.01").head()
    val est = r.getLong(0).toDouble
    val exact = r.getLong(1).toDouble // doc_id disjoint across sources => sum = global distinct
    assert(r.getLong(2) >= 2, "need multiple sources for the union to mean anything")
    assert(math.abs(est - exact) / exact < 0.05, s"union estimate $est vs exact $exact")
  }
}
