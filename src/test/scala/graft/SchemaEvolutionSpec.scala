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

  test("Tables.registerAll: every suite table queryable by name in SQL") {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    val n = spark.sql(
      "SELECT count(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey").head().getLong(0)
    assert(n > 0)
    assert(spark.sql("SELECT count(*) FROM documents").head().getLong(0) === 500L)
    assert(spark.sql("SELECT size(embedding) FROM embeddings LIMIT 1").head().getInt(0) === 64)
  }
}
