package graft

import graft.functions.EsFunctions
import org.apache.spark.sql.functions._

/** SQL parity for the custom expression battery: everything usable from the
  * Column API is callable from spark.sql after EsFunctions.register, and
  * both routes agree exactly. */
class SqlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  EsFunctions.register(spark)

  test("scalar functions agree between SQL and Column routes") {
    Seq(("routing-42", Seq(1.0, 2.0), Seq(3.0, 4.0)))
      .toDF("r", "va", "vb").createOrReplaceTempView("sqlfn_t")
    val viaSql = spark.sql(
      """SELECT es_hash(r) AS h, dot_product(va, vb) AS d,
        |  text_stats(r).token_cnt AS tc,
        |  shingle_hashes(r, 2) AS sh,
        |  minhash_sig(shingle_hashes(r, 2), 8) AS ms,
        |  jaccard_sorted(array_sort(shingle_hashes(r, 2)),
        |                 array_sort(shingle_hashes(r, 2))) AS j
        |FROM sqlfn_t""".stripMargin).head()
    val viaCols = spark.table("sqlfn_t").select(
      EsFunctions.es_hash(col("r")).as("h"),
      EsFunctions.dot_product(col("va"), col("vb")).as("d"),
      EsFunctions.shingle_hashes(col("r"), 2).as("sh"),
      EsFunctions.minhash_sig(EsFunctions.shingle_hashes(col("r"), 2), 8).as("ms")).head()
    assert(viaSql.getInt(0) === viaCols.getInt(0))
    assert(viaSql.getDouble(1) === viaCols.getDouble(1))
    assert(viaSql.getInt(2) === 1) // "routing-42" is one whitespace token
    assert(viaSql.getSeq[Long](3) === viaCols.getSeq[Long](2))
    assert(viaSql.getSeq[Long](4) === viaCols.getSeq[Long](3))
    assert(viaSql.getDouble(5) === 1.0)
  }

  test("aggregate functions callable from SQL (sketch + vector_sum)") {
    Seq(("g1", "a b c"), ("g1", "b c d"), ("g2", "x y z"))
      .toDF("g", "t").createOrReplaceTempView("sqlfn_docs")
    val sk = spark.sql(
      """SELECT g, minhash_sketch(shingle_hashes(t, 1), 16) AS sk
        |FROM sqlfn_docs GROUP BY g ORDER BY g""".stripMargin).collect()
    assert(sk.length === 2)
    assert(sk.forall(_.getSeq[Long](1).length === 16))

    Seq(("a", Seq(1.0, 2.0)), ("a", Seq(3.0, 4.0)))
      .toDF("g", "v").createOrReplaceTempView("sqlfn_vecs")
    val vs = spark.sql(
      "SELECT vector_sum(v) AS s FROM sqlfn_vecs GROUP BY g").head()
    assert(vs.getSeq[Double](0) === Seq(4.0, 6.0))

    val cbk = spark.sql(
      "SELECT count_by_key(g) AS m FROM sqlfn_docs").head()
      .getMap[String, Long](0)
    assert(cbk === Map("g1" -> 2L, "g2" -> 1L))
  }

  test("non-literal shingle k rejected with a clear message") {
    val e = intercept[Exception] {
      spark.sql("SELECT shingle_hashes('a', 1 + 1) FROM range(1)").collect()
    }
    // 1+1 folds to a literal before the builder in some plans; force a col
    val e2 = intercept[Exception] {
      spark.sql("SELECT shingle_hashes('a', CAST(id AS INT)) FROM range(1)").collect()
    }
    assert(e2.getMessage.contains("literal") || e2.getMessage.toLowerCase.contains("foldable"),
      e2.getMessage)
  }
}
