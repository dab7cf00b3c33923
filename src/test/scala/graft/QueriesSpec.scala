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

  test("approx_count_distinct within 5% of exact (q33)") {
    val r = Queries.all.find(_.name == "q33_approx_distinct").get
      .build(spark, "/root/testdata/sf0.01").head()
    val approx = r.getLong(0).toDouble
    val exact = r.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx $approx vs exact $exact")
  }
}
