package graft

import graft.ext.Dedup
import graft.functions.MinHashSketchAgg._
import org.apache.spark.sql.functions._

class MinHashSketchSpec extends SparkSpec {
  import spark.implicits._

  test("sketch of a single doc equals its signature; union law holds") {
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six")).toDF("id", "text")
      .withColumn("h", Dedup.shingleHashes(col("text"), 1))
    // group of one: sketch == minhash signature
    val single = docs.filter(col("id") === 1)
      .agg(minhash_sketch(col("h"), 16).as("sk"))
      .head().getSeq[Long](0)
    val sig = docs.filter(col("id") === 1)
      .select(Dedup.minhashSignature(col("h"), 16).as("s"))
      .head().getSeq[Long](0)
    assert(single === sig)
    // union: sketch(all) == elementwise min of the two signatures
    val both = docs.agg(minhash_sketch(col("h"), 16).as("sk")).head().getSeq[Long](0)
    val sig2 = docs.filter(col("id") === 2)
      .select(Dedup.minhashSignature(col("h"), 16).as("s"))
      .head().getSeq[Long](0)
    assert(both === sig.zip(sig2).map { case (a, b) => math.min(a, b) })
  }

  test("group-level sketch jaccard approximates exact word-set jaccard per source") {
    // per-source sketches over sf0.001 documents (one aggregation, no pair join)
    val docs = sf("sf0.001", "documents")
      .withColumn("h", Dedup.shingleHashes(col("text"), 1))
    val sketches = docs.groupBy("source")
      .agg(minhash_sketch(col("h"), 128).as("sk"))
    val a = sketches.alias("a")
    val b = sketches.alias("b")
    val est = a.join(b, col("a.source") < col("b.source"))
      .select(col("a.source").as("s1"), col("b.source").as("s2"),
        sketchJaccard(col("a.sk"), col("b.sk")).as("est"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    // exact union word-set jaccard per source pair
    val words = sf("sf0.001", "documents")
      .select(col("source"), explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .distinct()
    val wa = words.alias("wa")
    val exactInter = wa.join(words.alias("wb"),
        col("wa.w") === col("wb.w") && col("wa.source") < col("wb.source"))
      .groupBy(col("wa.source").as("s1"), col("wb.source").as("s2"))
      .agg(count(lit(1)).as("inter"))
    val sizes = words.groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = exactInter.collect().map { r =>
      val (s1, s2, inter) = (r.getString(0), r.getString(1), r.getLong(2))
      (s1, s2) -> inter.toDouble / (sizes(s1) + sizes(s2) - inter)
    }.toMap
    // MinHash standard error at k=128 is ~1/sqrt(128) ~ 0.09; allow 3 sigma
    var checked = 0
    for ((pair, e) <- exact if est.contains(pair)) {
      assert(math.abs(est(pair) - e) < 0.27, s"$pair est=${est(pair)} exact=$e")
      checked += 1
    }
    assert(checked > 50, s"only $checked source pairs compared")
  }
}
