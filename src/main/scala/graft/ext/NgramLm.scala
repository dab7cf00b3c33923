package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Character n-gram language model for corpus quality filtering — the
 * data-pipeline tier above [[TextAnalysis.qualityScore]]'s surface
 * heuristics: score each document by how probable its character sequence is
 * under a model trained on a reference corpus (the KenLM-filter pattern of
 * LLM data pipelines, at character granularity so it needs no tokenizer).
 *
 * Scale shape (same architecture as [[Bpe]]): training reduces the corpus
 * to a BOUNDED (ngram, count) table in one partial+final aggregate with a
 * TakeOrderedAndProject top-K cut — 100 TB of text never moves more than
 * once, and the driver holds at most `maxNgrams` rows. Scoring broadcasts
 * the log-prob table once per job (not per task closure) — per-row work,
 * no joins. Probabilities use add-k smoothing over P(c | prefix) with
 * truncation-safe context counts: context totals are derived from the FULL
 * gram-count table (prefix sums over the distinct-ngram aggregate, before
 * the top-K cut), so a dropped rare ngram degrades smoothly to the smoothed
 * floor instead of inflating the kept ngrams' conditionals.
 */
object NgramLm {

  case class LmModel(n: Int, ngramLogProb: Map[String, Double],
                     floorLogProb: Double) {
    /** Mean log-probability per character transition; higher = more like
      * the training corpus. Empty/short texts score the floor. */
    def scoreText(text: String): Double = {
      if (text == null) return floorLogProb
      val s = normalize(text)
      if (s.length < n) return floorLogProb
      var sum = 0.0
      var i = 0
      val m = s.length - n + 1
      while (i < m) {
        sum += ngramLogProb.getOrElse(s.substring(i, i + n), floorLogProb)
        i += 1
      }
      sum / m
    }
  }

  /** Shared normalization: lowercase, collapse whitespace — scoring must
    * see exactly what training saw. */
  private[ext] def normalize(s: String): String =
    s.toLowerCase.replaceAll("\\s+", " ")

  private def normalizeCol(c: Column): Column =
    regexp_replace(lower(c), "\\s+", " ")

  /** All char n-grams of a text column — one codegen'd pass
    * ([[graft.functions.CharNgrams]]). The earlier HOF form nested the
    * normalized-text subtree inside the per-element lambda; interpreted
    * evaluation re-ran regexp_replace+lower once per n-gram → O(len²) per
    * document, and it WAS the dominant train cost. Short/null texts yield
    * an empty array. */
  private[graft] def charNgrams(c: Column, n: Int): Column =
    graft.functions.EsFunctions.char_ngrams(c, n)

  /** Reference HOF formulation (spec-only differential pin). */
  private[graft] def charNgramsHof(c: Column, n: Int): Column = {
    val s = normalizeCol(c)
    when(length(s) >= n,
      transform(sequence(lit(1), length(s) - (n - 1)), i => s.substr(i, lit(n))))
      .otherwise(array().cast("array<string>"))
  }

  /**
   * Train on a corpus: one distributed ngram-count aggregate, top-`maxNgrams`
   * by count to the driver (TakeOrderedAndProject — no global sort), plus
   * the exact context totals for those ngrams' prefixes. Deterministic:
   * ties in the top-K cut break on the ngram itself.
   */
  def train(docs: DataFrame, textCol: String, n: Int = 3,
            maxNgrams: Int = 200000, addK: Double = 0.05): LmModel = {
    require(n >= 2, s"n must be >= 2, got $n")
    // small corpora often arrive as one input split; ngram extraction is
    // still the train cost (one codegen pass per doc), so spread it across
    // the cluster — a 5k-row exchange is noise next to millions of grams
    val spark = docs.sparkSession
    val spread = docs.select(col(textCol))
      .repartition(spark.sparkContext.defaultParallelism)
    // ONE corpus pass: the distinct-gram count table (bounded by the char
    // vocabulary ** n, stays distributed) feeds both the top-K cut and the
    // exact context totals — persisted so neither branch re-reads the corpus
    val gramCounts = spread
      .select(explode(charNgrams(col(textCol), n)).as("g"))
      .filter(length(col("g")) === n)
      .groupBy("g").agg(count(lit(1)).as("c"))
      .persist()
    try {
    val grams = gramCounts
      .orderBy(desc("c"), asc("g")).limit(maxNgrams)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    require(grams.nonEmpty, "ngram training produced no ngrams (empty corpus?)")
    // TRUE context totals: prefix sums over the FULL gram distribution (not
    // just the kept top-K), restricted to kept prefixes via broadcast
    // semi-join — bounded collect (<= maxNgrams rows), conditionals in
    // truncated contexts stay honest
    val keptPrefixes = grams.map(_._1.substring(0, n - 1)).distinct.toSeq
    val prefixDf = spark.createDataset(keptPrefixes)(
      org.apache.spark.sql.Encoders.STRING).toDF("p")
    val contextTotals: Map[String, Long] = gramCounts
      .groupBy(substring(col("g"), 1, n - 1).as("p")).agg(sum("c").as("t"))
      .join(broadcast(prefixDf), "p")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // alphabet size for smoothing = distinct final chars seen
    val alphabet = math.max(grams.map(_._1.last).distinct.length, 1)
    val logProb = grams.map { case (g, c) =>
      val ctx = contextTotals(g.substring(0, n - 1))
      g -> math.log((c + addK) / (ctx + addK * alphabet))
    }.toMap
    // floor: an unseen ngram in the least-likely seen context
    val minCtx = contextTotals.values.min
    LmModel(n, logProb, math.log(addK / (minCtx + addK * alphabet)))
    } finally gramCounts.unpersist()
  }

  /** Score a corpus against a trained model: adds `lm_score` (mean char
    * log-prob, higher = more in-distribution). The (<= 200k-entry) table is
    * BROADCAST once per job, not serialized into every task closure; one
    * map pass. */
  def score(docs: DataFrame, textCol: String, model: LmModel): DataFrame = {
    val bc = docs.sparkSession.sparkContext.broadcast(model)
    val fn = udf((s: String) => bc.value.scoreText(s))
    docs.withColumn("lm_score", fn(col(textCol)))
  }

  /** Filter form: keep documents scoring at least `minScore`. */
  def filterByScore(docs: DataFrame, textCol: String, model: LmModel,
                    minScore: Double): DataFrame =
    score(docs, textCol, model).filter(col("lm_score") >= minScore)
}
