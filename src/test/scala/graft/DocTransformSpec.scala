package graft

import graft.transform.{DocTransform, Names, SchemaInfer}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class DocTransformSpec extends SparkSpec {
  import spark.implicits._

  test("Names: normalization rules (P3)") {
    assert(Names.normalize("Foo&Bar$Baz") === "foo-bar-baz")
    assert(Names.mapFieldName("tags_il", "UserAge") === "tags_il-userage")
    assert(Names.mapFieldName("props", "K&ey") === "k-ey")
  }

  test("nullifyEmpty: null, empty, 'null' (any case) dropped (P2)") {
    val df = Seq("x", "", "null", "NULL", "ok", null).toDF("s")
      .select(DocTransform.nullifyEmpty(col("s")).as("v"))
    val vals = df.collect().map(r => Option(r.getString(0)))
    assert(vals.toSeq === Seq(Some("x"), None, None, None, Some("ok"), None))
  }

  test("docColumn: scalars serialized, nulls omitted, dates yyyyMMdd (P1/P4)") {
    val df = Seq(
      (1L, "alice", java.sql.Timestamp.valueOf("2024-03-05 10:00:00"), ""),
      (2L, null.asInstanceOf[String], null.asInstanceOf[java.sql.Timestamp], "z")
    ).toDF("id", "name", "ts", "note")
    val docs = df.select(DocTransform.docColumn(df.schema).as("doc")).collect().map(_.getString(0))
    assert(docs(0) === """{"id":1,"name":"alice","ts":"20240305","note":""}""" ||
           docs(0) === """{"id":1,"name":"alice","ts":"20240305"}""")
    // empty string note -> dropped; null name/ts -> dropped
    assert(docs(1) === """{"id":2,"note":"z"}""")
  }

  test("docColumn: map columns flattened into the doc with renamed keys (§2.3)") {
    val df = Seq(
      (1L, Map("A$x" -> "1", "b" -> "", "c" -> "null", "d" -> "ok")),
      (2L, Map.empty[String, String]),
    ).toDF("id", "tags_il")
    val docs = df.select(DocTransform.docColumn(df.schema).as("doc"))
      .collect().map(_.getString(0))
    assert(docs(0).contains(""""tags_il-a-x":"1""""))
    assert(docs(0).contains(""""tags_il-d":"ok""""))
    assert(!docs(0).contains(""""tags_il-b""""))  // empty dropped
    assert(!docs(0).contains(""""tags_il-c""""))  // "null" dropped
    assert(docs(1) === """{"id":2}""")
  }

  test("docs: id/routing extraction with fallback (P6)") {
    val df = Seq((10L, "r1"), (20L, null.asInstanceOf[String])).toDF("k", "r")
    val out = DocTransform.docs(df, "k", Some("r")).collect()
    assert(out.map(_.getString(0)).toSeq === Seq("10", "20"))
    assert(out(0).getString(1) === "r1")
    assert(out(1).getString(1) === "20") // null routing falls back to id
  }

  test("docs: no id and no routing -> seeded random key, null _id (P6 fallback)") {
    val df = Seq(("a", 1), ("b", 2)).toDF("s", "n")
    val out = DocTransform.docs(df, null, None).collect()
    assert(out.forall(_.isNullAt(0)))
    val keys = out.map(_.getString(1))
    assert(keys.forall(k => k != null && k.nonEmpty))
    // deterministic under the seed
    val again = DocTransform.docs(df, null, None).collect().map(_.getString(1))
    assert(keys.toSeq === again.toSeq)
  }

  test("SchemaInfer: mapping with type conversion, index rules, dynamic keys") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("age", IntegerType),
      StructField("price", DecimalType(10, 2)), StructField("name", StringType),
      StructField("born", DateType), StructField("secret_ex", StringType),
      StructField("tags_il", MapType(StringType, StringType)),
    ))
    val rows = Seq(
      Row(1L, 5, BigDecimal(1.5).bigDecimal, "n", java.sql.Date.valueOf("2020-01-01"),
        "s", Map("K1" -> "v")),
      Row(2L, 6, BigDecimal(2.5).bigDecimal, "m", java.sql.Date.valueOf("2020-01-02"),
        "t", Map("k2" -> "w")),
    )
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val specs = SchemaInfer.infer(df).map(s => s.esKey -> s).toMap
    assert(specs("id").esType === "long")
    assert(specs("age").esType === "integer")
    assert(specs("price").esType === "double")
    assert(specs("name").esType === "string")
    assert(specs("name").index === Some("not_analyzed"))
    assert(specs("born").esType === "date")
    assert(specs("born").format === Some("yyyyMMdd"))
    assert(specs("secret_ex").index === Some("no"))     // _ex suffix not indexed
    assert(specs("tags_il-k1").index === Some("no"))    // dynamic keys not indexed
    assert(specs("tags_il-k2").esType === "string")
    // include-list override wins
    val specs2 = SchemaInfer.infer(df, indexEsFields = Set("secret_ex"))
      .map(s => s.esKey -> s).toMap
    assert(specs2("secret_ex").index === Some("not_analyzed"))
    // manual type override
    val specs3 = SchemaInfer.infer(df, typeOverrides = Map("age" -> "long"))
      .map(s => s.esKey -> s).toMap
    assert(specs3("age").esType === "long")
  }

  test("mapping json round-trips through Spark's JSON reader") {
    val df = Seq((1L, "x")).toDF("id", "name")
    val json = SchemaInfer.toMappingJson(SchemaInfer.infer(df))
    val parsed = spark.read.json(Seq(json).toDS())
    assert(parsed.columns.sorted.toSeq === Seq("id", "name"))
  }
}
