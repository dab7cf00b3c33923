package graft.pipeline

import graft.ext.{Bpe, Dedup, NgramLm, TextAnalysis}
import graft.sink.BundleSink
import graft.transform.DocTransform
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The end-to-end training-data pipeline, one pass over a document corpus
 * (`--mode pipeline`):
 *
 *   read [-> PII redaction] -> quality filter [-> ngram-LM filter]
 *        -> exact dedup -> MinHash near-dup removal
 *        -> BPE tokenize -> columnar bundle (+ bpe model + stage stats)
 *
 * Every stage is one of this engine's operators; the composition is what a
 * 100 TB pretraining-data build actually runs. Stage semantics:
 *  - redaction (`redactPii = true`): [[TextAnalysis.redactPii]] applied
 *    before anything else, so dedup/tokenization see the released text.
 *  - quality: [[TextAnalysis.qualityScoreRaw]] >= `qualityMin` (unrounded —
 *    thresholds on the raw value).
 *  - LM filter (`lmMinScore = Some(x)`): [[NgramLm]] trained on the
 *    quality-passed corpus itself, then docs scoring below `x` mean char
 *    log-prob are dropped — catches fluent-looking junk the surface
 *    heuristics pass.
 *  - exact dedup: first doc (lowest id) per normalized-text group survives.
 *  - near-dup removal (`nearDupMethod`): candidates from banded LSH, the
 *    HIGHER id of each surviving pair dropped (greedy canonical-minimum; a
 *    chain A~B~C keeps A, and keeps C only if C~A was below threshold — the
 *    standard cheap approximation). Two interchangeable notions of "near":
 *      - `"minhash"` (default): shingle MinHash bands + Jaccard >=
 *        `nearDupThreshold` — surface-text similarity.
 *      - `"embedding"`: hyperplane-LSH buckets + cosine >=
 *        `nearDupThreshold` over `embeddingCol` — semantic similarity
 *        (catches paraphrases/translations MinHash can't), for corpora that
 *        carry embeddings. Same bucketed shuffle shape, same skew caps.
 *  - tokenize: BPE trained on the SURVIVING corpus, tokens + counts land as
 *    typed columns in the columnar bundle; the model is persisted next to
 *    the manifest for downstream reuse.
 */
object CorpusPipeline {

  case class Stats(input: Long, afterQuality: Long, afterExact: Long,
                   afterNearDup: Long, totalTokens: Long,
                   bundle: BundleSink.Result, afterLm: Long = -1L)

  def run(spark: SparkSession, input: String, outDir: String, indexName: String,
          idCol: String = "doc_id", textCol: String = "text",
          numShards: Int = 3, partitionMultiples: Int = 4,
          qualityMin: Double = 0.5, nearDupThreshold: Double = 0.9,
          bpeMerges: Int = 2000, bpeMaxWords: Int = 50000,
          redactPii: Boolean = false,
          lmMinScore: Option[Double] = None,
          nearDupMethod: String = "minhash",
          embeddingCol: String = "embedding"): Stats = {
    val raw = spark.read.parquet(input)
    val docs =
      if (redactPii) raw.withColumn(textCol, TextAnalysis.redactPii(col(textCol)))
      else raw
    val nInput = docs.count()

    val surface = docs.filter(TextAnalysis.qualityScoreRaw(col(textCol)) >= qualityMin)
    val (quality, nLm) = lmMinScore match {
      case Some(min) =>
        val lm = NgramLm.train(surface, textCol)
        val kept = NgramLm.filterByScore(surface, textCol, lm, min).drop("lm_score")
        (kept, kept.count())
      case None => (surface, -1L)
    }
    val nQuality = surface.count()

    // exact dedup keeping FULL rows (Dedup.exact projects to key+order
    // cols): group-limit window on the normalized text, lowest id survives
    val wNorm = org.apache.spark.sql.expressions.Window
      .partitionBy("_norm").orderBy(idCol)
    val exact = quality
      .withColumn("_norm", regexp_replace(lower(trim(col(textCol))), "\\s+", " "))
      .withColumn("_rn", row_number().over(wNorm))
      .filter(col("_rn") === 1).drop("_norm", "_rn")
    val nExact = exact.count()

    // near-dup pairs on the exact-deduped corpus; drop the higher id of
    // each pair (distinct drop-set, then one left_anti)
    val pairs = nearDupMethod match {
      case "minhash" =>
        Dedup.minhashNearDups(exact, idCol, textCol, threshold = nearDupThreshold)
      case "embedding" =>
        require(exact.columns.contains(embeddingCol),
          s"nearDupMethod=embedding needs column '$embeddingCol' on the corpus")
        val dim = exact.select(size(col(embeddingCol))).head().getInt(0)
        graft.ext.Similarity.cosineNearDupsLsh(exact, idCol, embeddingCol,
          threshold = nearDupThreshold, dim = dim)
      case other => throw new IllegalArgumentException(
        s"unknown nearDupMethod '$other' (minhash | embedding)")
    }
    val dropIds = pairs.select(col("id_b").as(idCol)).distinct()
    val survivors = exact.join(dropIds, Seq(idCol), "left_anti")
    val nSurvivors = survivors.count()

    // tokenizer trained on what survives (junk filtered out above), ridden
    // into the bundle as typed columns
    val model = Bpe.train(survivors, textCol, bpeMerges, bpeMaxWords)
    val tokenized = survivors
      .withColumn("bpe_tokens", model.tokens(col(textCol)))
      .withColumn("bpe_token_cnt", size(col("bpe_tokens")))
      .withColumn("vocab_fit", round(model.vocabularyFit(col(textCol)), 4))
    val totalTokens = tokenized.agg(sum("bpe_token_cnt")).head().getLong(0)

    val bundleDocs = DocTransform.docsColumnar(tokenized, idCol, None)
    val res = BundleSink.write(bundleDocs, s"$outDir/$indexName", numShards,
      partitionMultiples, repartition = true, format = "columnar",
      indexName = indexName)
    Bpe.save(spark, model, s"$outDir/$indexName/bpe_model.json")
    Stats(nInput, nQuality, nExact, nSurvivors, totalTokens, res, afterLm = nLm)
  }
}
