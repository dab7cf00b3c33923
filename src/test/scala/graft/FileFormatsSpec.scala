package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** §2.11 "file formats beyond Hive tables": parquet/json/csv/orc round-trips
  * through DataFrameReader/Writer preserve row content. */
class FileFormatsSpec extends SparkSpec {

  test("parquet/json/csv/orc round-trip equals source") {
    val dir = Files.createTempDirectory("graft-fmt").toString
    val src = sf("sf0.001", "customer").orderBy("c_custkey")
    val srcRows = src.collect().toSeq

    src.write.mode("overwrite").parquet(s"$dir/p")
    assert(spark.read.parquet(s"$dir/p").orderBy("c_custkey").collect().toSeq === srcRows)

    src.write.mode("overwrite").json(s"$dir/j")
    val jback = spark.read.schema(src.schema).json(s"$dir/j")
    assert(jback.orderBy("c_custkey").collect().toSeq === srcRows)

    src.write.mode("overwrite").option("header", "true").csv(s"$dir/c")
    val cback = spark.read.schema(src.schema).option("header", "true").csv(s"$dir/c")
    assert(cback.orderBy("c_custkey").collect().toSeq === srcRows)

    src.write.mode("overwrite").orc(s"$dir/o")
    assert(spark.read.orc(s"$dir/o").orderBy("c_custkey").collect().toSeq === srcRows)
  }

  test("metadata-table type overrides flow into mapping + coercion (S3/A2)") {
    import spark.implicits._
    val meta = Seq(("c_acctbal", "integer"), (" c_name ", " string ")).toDF("index_name", "data_type")
    val overrides = graft.pipeline.Hive2Es.typeOverridesFromTable(meta)
    assert(overrides === Map("c_acctbal" -> "integer", "c_name" -> "string"))
    val specs = graft.transform.SchemaInfer
      .infer(sf("sf0.001", "customer"), typeOverrides = overrides)
      .map(s => s.esKey -> s.esType).toMap
    assert(specs("c_acctbal") === "integer") // double overridden to integer
    // value coercion truncates like the reference's intValue()
    val v = sf("sf0.001", "customer")
      .select(graft.transform.DocTransform.coerce(col("c_acctbal"),
        org.apache.spark.sql.types.DoubleType, "integer").as("v"))
      .filter(col("v").isNotNull).head().get(0)
    assert(v.isInstanceOf[Int])
  }
}
