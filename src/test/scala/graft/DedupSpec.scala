package graft

import graft.ext.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("exact: representative is lexicographic min, dup_cnt correct") {
    val df = Seq(
      ("k1", 5.0, 30.0), ("k1", 3.0, 99.0), ("k1", 3.0, 10.0),
      ("k2", 7.0, 1.0)).toDF("k", "q", "p")
    val out = Dedup.exact(df, Seq("k"), Seq("q", "p")).orderBy("k").collect()
    assert(out(0).getString(0) === "k1")
    assert(out(0).getDouble(1) === 3.0)
    assert(out(0).getDouble(2) === 10.0) // min struct: (3.0, 10.0) < (3.0, 99.0)
    assert(out(0).getLong(3) === 3L)
    assert(out(1).getLong(3) === 1L)
  }

  test("shingles: distinct word k-grams; short text collapses to whole text") {
    val df = Seq("a b c d", "x y").toDF("t")
      .select(Dedup.shingles(col("t"), 3).as("sh"))
    val rows = df.collect().map(_.getSeq[String](0).toSet)
    assert(rows(0) === Set("a b c", "b c d"))
    assert(rows(1) === Set("x y")) // fewer than k tokens
  }

  test("jaccard_sorted equals generic jaccard on hashed shingles") {
    val d = sf("sf0.001", "documents").limit(60)
      .select(array_sort(Dedup.shingleHashes(col("text"))).as("h"))
    val pairs = d.alias("a").crossJoin(d.alias("b")).limit(500)
      .select(graft.functions.EsFunctions.jaccard_sorted(col("a.h"), col("b.h")).as("fast"),
        Dedup.jaccard(col("a.h"), col("b.h")).as("ref"))
    assert(pairs.filter(col("fast") =!= col("ref")).count() === 0)
  }

  test("jaccard: exact on known sets") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
      .select(Dedup.jaccard(col("x"), col("y")).as("j"))
    assert(math.abs(df.head().getDouble(0) - 0.5) < 1e-12)
  }

  test("native shingle_hashes equals the HOF reference formulation") {
    val texts = sf("sf0.001", "documents").select("text").limit(100)
      .union(Seq("", "one", "one two", "  spaced   out  words here ").toDF("text"))
    val native = texts.select(Dedup.shingleHashes(col("text"), 3).as("h")).collect()
    val hof = texts.select(Dedup.shingleHashesHof(col("text"), 3).as("h")).collect()
    assert(native.map(_.getSeq[Long](0)).toSeq === hof.map(_.getSeq[Long](0)).toSeq)
  }

  test("native minhash_sig equals the HOF reference formulation") {
    val texts = sf("sf0.001", "documents").select("text").limit(50)
    val base = texts.select(Dedup.shingleHashes(col("text")).as("h"))
    val native = base.select(Dedup.minhashSignature(col("h"), 32).as("s")).collect()
    val hof = base.select(Dedup.minhashSignatureHof(col("h"), 32).as("s")).collect()
    assert(native.map(_.getSeq[Long](0)).toSeq === hof.map(_.getSeq[Long](0)).toSeq)
  }

  test("minhash signature similarity tracks jaccard") {
    // two texts sharing most shingles vs two unrelated texts
    val near = ("the quick brown fox jumps over the lazy dog tonight",
      "the quick brown fox jumps over the lazy cat tonight")
    val far = ("alpha beta gamma delta epsilon zeta eta theta",
      "one two three four five six seven eight")
    def sigAgreement(a: String, b: String): Double = {
      val df = Seq(a, b).toDF("t")
        .select(Dedup.minhashSignature(Dedup.shingleHashes(col("t")), 64).as("sig"))
      val Array(s1, s2) = df.collect().map(_.getSeq[Long](0))
      s1.zip(s2).count { case (x, y) => x == y }.toDouble / s1.length
    }
    assert(sigAgreement(near._1, near._2) > 0.5)
    assert(sigAgreement(far._1, far._2) < 0.2)
  }

  test("minhashNearDups recall: finds planted near-duplicates (sf0.001 docs + clones)") {
    val docs = sf("sf0.001", "documents").select("doc_id", "text").limit(100)
    // plant clones: doc_id+100000 with one word changed
    val clones = docs.select((col("doc_id") + 100000).as("doc_id"),
      concat(col("text"), lit(" trailing")).as("text"))
    val all = docs.union(clones)
    val found = Dedup.minhashNearDups(all, "doc_id", "text",
      numHashes = 64, bands = 16, threshold = 0.5)
      .filter(col("id_b") === col("id_a") + 100000)
      .count()
    // every clone pair has jaccard ~ n/(n+1) >= 0.9; 16 bands x 4 rows
    // => detection probability per pair ~ 1-(1-0.9^4)^16 ~ 1.0
    assert(found >= 95, s"found only $found of 100 planted near-dup pairs")
  }

  test("simhash: identical texts equal; near texts within small hamming") {
    val df = Seq(
      ("a", "the quick brown fox jumps over the lazy dog again and again today"),
      ("b", "the quick brown fox jumps over the lazy dog again and again tomorrow"),
      ("c", "completely unrelated words nothing shared here at all zebra")).toDF("id", "t")
      .select(col("id"), Dedup.simhash(col("t")).as("sh"))
    val m = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(m("a"), m("a")) === 0)
    assert(ham(m("a"), m("b")) < ham(m("a"), m("c")),
      s"near ${ham(m("a"), m("b"))} !< far ${ham(m("a"), m("c"))}")
  }
}
