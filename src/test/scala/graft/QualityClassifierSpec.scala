package graft

import graft.ext.{QualityClassifier, QualityModel}
import org.apache.spark.sql.functions._

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  // natural-ish positives: stopword-rich sentences over a small topical
  // vocabulary; gibberish negatives: random consonant clusters. Train and
  // held-out draws come from the same distributions but share no rows.
  private val content = Vector("cat", "river", "theory", "music", "bread",
    "garden", "window", "mountain", "letter", "engine")
  private val glue = Vector("the", "of", "and", "to", "a", "in", "is", "was")
  private def natural(rnd: scala.util.Random, n: Int) =
    (0 until n).map(_ => s"${glue(rnd.nextInt(glue.size))} " +
      s"${content(rnd.nextInt(content.size))}").mkString(" ")
  private def gibberish(rnd: scala.util.Random, n: Int) =
    (0 until n).map(_ => (0 until 5 + rnd.nextInt(6))
      .map(_ => "bcdfghjklmnpqrstvwxz".charAt(rnd.nextInt(20))).mkString).mkString(" ")

  private lazy val model: QualityModel = {
    val rnd = new scala.util.Random(71)
    val pos = (0 until 300).map(_ => natural(rnd, 12)).toDF("text")
    val neg = (0 until 300).map(_ => gibberish(rnd, 12)).toDF("text")
    QualityClassifier.train(pos, neg, "text", dim = 1 << 14, maxIter = 30)
  }

  test("separation: held-out natural text scores high, gibberish low") {
    val rnd = new scala.util.Random(172)
    val posHold = (0 until 50).map(_ => natural(rnd, 12)).toDF("text")
    val negHold = (0 until 50).map(_ => gibberish(rnd, 12)).toDF("text")
    val pAvg = QualityClassifier.score(posHold, "text", model)
      .agg(avg("quality_prob")).head().getDouble(0)
    val nAvg = QualityClassifier.score(negHold, "text", model)
      .agg(avg("quality_prob")).head().getDouble(0)
    assert(pAvg > 0.8, s"held-out positives averaged $pAvg")
    assert(nAvg < 0.2, s"held-out negatives averaged $nAvg")
  }

  test("save/load round-trip reproduces scores exactly; null text scores null") {
    val path = java.nio.file.Files.createTempDirectory("graft-qc").toString + "/quality_model.json"
    QualityClassifier.save(spark, model, path)
    val loaded = QualityClassifier.load(spark, path)
    assert(loaded.dim === model.dim && loaded.intercept === model.intercept)
    val rnd = new scala.util.Random(9)
    val docs = ((0 until 20).map(i => (i.toLong, natural(rnd, 8))) :+ (99L, null))
      .toDF("doc_id", "text")
    val a = QualityClassifier.score(docs, "text", model)
      .select("doc_id", "quality_prob").orderBy("doc_id").collect()
    val b = QualityClassifier.score(docs, "text", loaded)
      .select("doc_id", "quality_prob").orderBy("doc_id").collect()
    assert(a === b, "persisted model scored differently")
    assert(a.last.isNullAt(1), "null text must score null")
  }

  test("scoring is map-only: no exchange in the scored plan") {
    val docs = (0L until 100L).map(i => (i, s"the cat $i of the river"))
      .toDF("doc_id", "text")
    val plan = QualityClassifier.score(docs, "text", model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring shuffled:\n$plan")
  }
  test("paretoSample: portable draws (independent md5 reimpl), monotone in score, smooth tail") {
    val ids = (0L until 4000L)
    // independent reimplementation of the draw: MessageDigest md5 over
    // "<seed>:<id>", first 13 hex chars as 52-bit uniform, inverse-CDF
    def keep(id: Long, score: Double, seed: Long, alpha: Double): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$seed:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val u = java.lang.Long.parseLong(hex.substring(0, 13), 16).toDouble /
        math.pow(2, 52)
      math.pow(1.0 - u, -1.0 / alpha) - 1.0 > 1.0 - score
    }
    val df = ids.map(i => (i, 0.5)).toDF("doc_id", "score")
    val kept = QualityClassifier.paretoSample(df, "doc_id", "score", 9.0, 7L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = ids.filter(keep(_, 0.5, 7L, 9.0)).toSet
    assert(kept === expected, "Spark draw != independent md5 reimplementation")
    // smooth tail, not a cliff: score 0.5 survives at ~(2-0.5)^(-9) = 2.6%
    assert(kept.size > 20 && kept.size < 400, s"${kept.size} of 4000 at score 0.5")
    // monotone per id: raising the score can only add keeps
    val kept9 = QualityClassifier.paretoSample(
      ids.map(i => (i, 0.9)).toDF("doc_id", "score"), "doc_id", "score", 9.0, 7L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.subsetOf(kept9), "keep set not monotone in score")
    // a perfect score is a near-certain keep (draw > 0 for every u > 0)
    val kept1 = QualityClassifier.paretoSample(
      ids.map(i => (i, 1.0)).toDF("doc_id", "score"), "doc_id", "score", 9.0, 7L).count()
    assert(kept1 === 4000L)
    // a new seed is an independent resample
    val reseeded = QualityClassifier.paretoSample(df, "doc_id", "score", 9.0, 8L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(reseeded !== kept, "reseed must change the sample")
  }
}
