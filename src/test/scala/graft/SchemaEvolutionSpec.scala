package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Pipeline-relevant schema evolution: batches written with divergent
  * schemas read back unified (parquet mergeSchema), and the SQL-by-name
  * surface via Tables.registerAll. */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("parquet mergeSchema unifies batches with added columns") {
    val dir = Files.createTempDirectory("graft-evo").toString
    Seq((1L, "a")).toDF("id", "name").write.parquet(s"$dir/d/batch=1")
    Seq((2L, "b", 9.5)).toDF("id", "name", "score").write.parquet(s"$dir/d/batch=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(s"$dir/d")
    assert(merged.columns.toSet === Set("id", "name", "score", "batch"))
    val rows = merged.orderBy("id").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("score"))) // old batch -> null
    assert(rows(1).getDouble(rows(1).fieldIndex("score")) === 9.5)
  }

  test("columnar bundle survives schema evolution: new doc field appears via mergeSchema") {
    val out = java.nio.file.Files.createTempDirectory("graft-evolve").toString
    import org.apache.spark.sql.functions._
    val v1 = sf("sf0.001", "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    val d1 = graft.transform.DocTransform.docsColumnar(v1, "o_orderkey", Some("o_custkey"))
    graft.sink.BundleSink.write(d1, s"$out/idx", numShards = 2,
      partitionMultiples = 1, repartition = true, format = "columnar", indexName = "idx")
    // a later producer adds a column; append to the same data dir
    val v2 = sf("sf0.001", "orders").limit(10)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        lit("enriched").as("pipeline_tag"))
    graft.transform.DocTransform.docsColumnar(v2, "o_orderkey", Some("o_custkey"))
      .withColumn("_shard", graft.functions.EsFunctions.es_shard(col("_routing"), 2))
      .write.mode("append").partitionBy("_shard").parquet(s"$out/idx/data")
    val merged = spark.read.option("mergeSchema", "true").parquet(s"$out/idx/data")
    assert(merged.columns.contains("pipeline_tag"))
    assert(merged.count() === 1510)
    // old rows read as null in the new field, new rows carry it
    assert(merged.filter(col("pipeline_tag").isNotNull).count() === 10)
  }

  test("Tables.registerAll: every suite table queryable by name in SQL") {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    val n = spark.sql(
      "SELECT count(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey").head().getLong(0)
    assert(n > 0)
    assert(spark.sql("SELECT count(*) FROM documents").head().getLong(0) === 500L)
    assert(spark.sql("SELECT size(embedding) FROM embeddings LIMIT 1").head().getInt(0) === 64)
  }
}
