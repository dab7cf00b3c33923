package graft

import graft.ext.NgramLm
import org.apache.spark.sql.functions._

class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = sf("sf0.001", "documents")
  lazy val model = NgramLm.train(docs, "text", n = 3, maxNgrams = 50000)

  test("codegen char_ngrams: bit-identical to the HOF reference formulation") {
    val texts = Seq(
      "Hello,  World!\tmixed\n WS", "abc", "ab", "a", "",
      "  leading and   trailing  ", "ÜPPER Straße çédille",
      "numbers 12345 and 67890", "\n\n\t", "sOlO",
      null.asInstanceOf[String] // null text -> empty array on BOTH forms
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) } ++
      (100 until 200).map { i =>
        val r = new scala.util.Random(i)
        (i.toLong, (0 until 40).map(_ =>
          if (r.nextInt(5) == 0) " " else ('a' + r.nextInt(26)).toChar).mkString)
      }
    val df = texts.toDF("id", "text")
    for (n <- Seq(2, 3, 4)) {
      val rows = df.select(col("id"),
          NgramLm.charNgrams(col("text"), n).as("native"),
          NgramLm.charNgramsHof(col("text"), n).as("ref"))
        .collect()
      rows.foreach { r =>
        assert(r.getAs[scala.collection.Seq[String]]("native") ===
          r.getAs[scala.collection.Seq[String]]("ref"),
          s"n=$n id=${r.getLong(0)}")
      }
    }
  }

  test("training is deterministic and bounded") {
    val m2 = NgramLm.train(docs, "text", n = 3, maxNgrams = 50000)
    assert(model.ngramLogProb === m2.ngramLogProb)
    assert(model.floorLogProb === m2.floorLogProb)
    assert(model.ngramLogProb.size <= 50000)
    // probabilities, not scores: every entry strictly negative log-prob
    assert(model.ngramLogProb.values.forall(_ < 0.0))
    assert(model.floorLogProb < model.ngramLogProb.values.max)
  }

  test("in-distribution text scores far above junk; filter separates them") {
    val rnd = new scala.util.Random(7)
    val junk = (0 until 50).map(i =>
      (100000L + i, (0 until 200).map(_ => ('a' + rnd.nextInt(26)).toChar)
        .mkString.grouped(7).mkString(" ")))
      .toDF("doc_id", "text")
    val cleanScores = NgramLm.score(docs.limit(100), "text", model)
      .select("lm_score").as[Double].collect()
    val junkScores = NgramLm.score(junk, "text", model)
      .select("lm_score").as[Double].collect()
    val cleanMean = cleanScores.sum / cleanScores.length
    val junkMean = junkScores.sum / junkScores.length
    assert(cleanMean > junkMean + 1.0,
      f"no separation: clean $cleanMean%.2f vs junk $junkMean%.2f")
    // a threshold between the means keeps (nearly) all clean, drops (nearly)
    // all junk
    val cut = (cleanMean + junkMean) / 2
    val keptClean = NgramLm.filterByScore(docs.limit(100), "text", model, cut).count()
    val keptJunk = NgramLm.filterByScore(junk, "text", model, cut).count()
    assert(keptClean >= 95, s"filter dropped clean docs: kept $keptClean/100")
    assert(keptJunk <= 5, s"filter kept junk docs: $keptJunk/50")
  }

  test("scoring edge cases: null, empty, shorter than n -> floor") {
    val edge = Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, "ab"))
      .toDF("doc_id", "text")
    val scores = NgramLm.score(edge, "text", model)
      .select("lm_score").as[Double].collect()
    assert(scores.forall(_ === model.floorLogProb))
  }
}
