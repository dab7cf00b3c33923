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

  test("unit_vec: bit-identical to the HOF reference formulation, zero-vector passthrough") {
    val rnd = new scala.util.Random(61)
    val vecs = (0 until 200).map(i =>
      (i.toLong, Seq.fill(16)((rnd.nextGaussian() * math.pow(10, rnd.nextInt(6) - 3)).toFloat))) :+
      (999L, Seq.fill(16)(0.0f)) // zero vector -> zeros out, no NaN
    val df = vecs.toDF("id", "v")
    val asD = col("v").cast("array<double>")
    // reference HOF formulation (what unit_vec replaced): same op order, so
    // equality must be EXACT, not approximate
    val n = sqrt(aggregate(asD, lit(0.0), (acc, x) => acc + x * x))
    val hof = when(n === 0, asD).otherwise(transform(asD, x => x / n))
    val rows = df.select(col("id"),
        EsFunctions.unit_vec(asD).as("native"), hof.as("ref"))
      .collect()
    rows.foreach { r =>
      val a = r.getAs[scala.collection.Seq[Double]]("native")
      val b = r.getAs[scala.collection.Seq[Double]]("ref")
      assert(a === b, s"id=${r.getLong(0)}: $a vs $b")
    }
    // SQL route registered
    EsFunctions.register(spark)
    df.createOrReplaceTempView("uv_t")
    assert(spark.sql("SELECT unit_vec(CAST(v AS array<double>)) FROM uv_t").count() === 201)
  }

  test("lsh_sig / lsh_plane_dots / mat_vec: match naive per-element formulations") {
    import graft.ext.Similarity
    val rnd = new scala.util.Random(67)
    val dim = 24
    val vecs = (0 until 100).map(i => (i.toLong, Seq.fill(dim)(rnd.nextGaussian())))
    val df = vecs.toDF("id", "v")
    for (table <- Seq(0, 3); bits <- Seq(6, 14)) {
      // naive reference: per-bit literal-array dot signs (the formulation
      // the payload kernel replaced — identical plane values by seed)
      val sig = Similarity.lshSignature(col("v"), dim, table, bits)
      val naive = (0 until bits).map { b =>
        val plane = array((0 until dim).map(j =>
          lit(Similarity.planeComponent(table, b, j))): _*)
        when(EsFunctions.dot_product(col("v"), plane) >= 0, lit(1L << b)).otherwise(lit(0L))
      }.reduce(_ + _)
      val bad = df.select(sig.as("k"), naive.as("r")).filter(col("k") =!= col("r")).count()
      assert(bad === 0, s"table=$table bits=$bits: $bad signature mismatches")
    }
    // mat_vec: y = R v against a driver-side reference
    val matDim = 8
    val rot = Array.fill(matDim * matDim)(rnd.nextGaussian())
    val small = (0 until 50).map(i => (i.toLong, Seq.fill(matDim)(rnd.nextGaussian())))
    val got = small.toDF("id", "v")
      .select(col("id"), graft.functions.PqFunctions.mat_vec(col("v"), rot, matDim).as("y"))
      .collect().map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Double]]("y")).toMap
    small.foreach { case (id, v) =>
      val expect = (0 until matDim).map(i =>
        (0 until matDim).map(j => rot(i * matDim + j) * v(j)).sum)
      got(id).zip(expect).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-12, s"id=$id: $a vs $b") }
    }
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
