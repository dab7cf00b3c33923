package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for a training-data pipeline, built entirely from
 * codegen'd Spark builtins (no UDFs): token counting, quality scoring,
 * n-gram-heuristic language ID, document fingerprinting.
 *
 * Capability extension beyond the reference engine (SURVEY.md §7.1 "ext/"),
 * designed so every expression stays inside WholeStageCodegen at 100 TB.
 */
object TextAnalysis {

  /** One-pass stats struct (token_cnt, punct_cnt, all_hits, hits_<lang>) —
    * see graft.functions.TextStats. Repeated uses in one projection are
    * deduplicated by Spark's subexpression elimination. */
  private def stats(text: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.TextStatsExpr(
        org.apache.spark.sql.GraftSqlBridge.expression(text)))

  /** Whitespace tokens; "" -> [""] (same as DuckDB string_split_regex). */
  def tokens(text: Column): Column = split(text, "\\s+")

  def tokenCount(text: Column): Column = stats(text).getField("token_cnt")

  private[graft] def tokenCountHof(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count estimate: words plus intra-word case/digit
    * transitions (a cheap, deterministic proxy for a real tokenizer). */
  def subwordCountEstimate(text: Column): Column =
    tokenCount(text) +
      size(split(text, "(?<=[a-z])(?=[A-Z])|(?<=[A-Za-z])(?=[0-9])")) - lit(1)

  def punctCount(text: Column): Column = stats(text).getField("punct_cnt")

  private[graft] def punctCountHof(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,!?;:]", ""))

  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0)
      .otherwise(punctCount(text).cast("double") / length(text).cast("double"))

  /** Stopword lists per language for the voting heuristic. Tiny on purpose:
    * deterministic, order-free, and identical to the SQL oracle generated
    * from the same lists (see Queries.langIdCaseSql). */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "de", "y", "que"),
    "de" -> Seq("der", "die", "das", "und", "zu"),
    "fr" -> Seq("le", "la", "de", "et", "les"),
  )

  /** How many tokens of `text` appear in `words` (multiset count). */
  private[graft] def stopwordHitsHof(text: Column, words: Seq[String]): Column = {
    val wordArr = array(words.map(lit): _*)
    size(filter(tokens(text), t => array_contains(wordArr, t)))
  }

  def stopwordRatio(text: Column): Column = {
    val st = stats(text)
    when(st.getField("token_cnt") === 0, 0.0)
      .otherwise(st.getField("all_hits").cast("double") /
        st.getField("token_cnt").cast("double"))
  }

  /** Language-ID by stopword votes: the language with the most stopword hits
    * wins; ties broken by list order ("en" first); zero hits -> "und". */
  def langId(text: Column): Column = {
    val st = stats(text)
    val hits = stopwords.map { case (lang, _) => lang -> st.getField(s"hits_$lang") }
    val best = hits.tail.foldLeft((hits.head._1: String, hits.head._2, lit(hits.head._1))) {
      case ((_, bestHits, bestLang), (lang, h)) =>
        (lang, greatest(bestHits, h), when(h > bestHits, lit(lang)).otherwise(bestLang))
    }
    when(greatest(hits.map(_._2): _*) === 0, lit("und")).otherwise(best._3)
  }

  private[graft] def langIdHof(text: Column): Column = {
    val hits = stopwords.map { case (lang, words) => lang -> stopwordHitsHof(text, words) }
    val best = hits.tail.foldLeft((hits.head._1: String, hits.head._2, lit(hits.head._1))) {
      case ((_, bestHits, bestLang), (lang, h)) =>
        (lang, greatest(bestHits, h), when(h > bestHits, lit(lang)).otherwise(bestLang))
    }
    when(greatest(hits.map(_._2): _*) === 0, lit("und")).otherwise(best._3)
  }

  /** 64-bit document fingerprint: xxhash64 of the normalized text (lowercase,
    * collapsed whitespace). Rolling/shingled variants: Dedup.shingles. */
  def fingerprint(text: Column): Column =
    xxhash64(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Composite quality score in [0,1], unrounded — use for filters and
    * further aggregation (rounding first would shift threshold comparisons
    * and averages vs an oracle computing on the raw value). */
  def qualityScoreRaw(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 400.0, lit(1.0))
    val punctPenalty = least(punctRatio(text) * 5.0, lit(1.0))
    val swScore = least(stopwordRatio(text) * 10.0, lit(1.0))
    lenScore * 0.5 + swScore * 0.3 + (lit(1.0) - punctPenalty) * 0.2
  }

  /** Composite quality score in [0,1]: favors mid-length docs with low
    * punctuation density and some stopword mass. Deterministic arithmetic,
    * rounded for stable cross-engine comparison. */
  def qualityScore(text: Column): Column = round(qualityScoreRaw(text), 6)

  /** PII scrubbing for corpus release: replace emails, URLs, long digit
    * runs (phone/card/ssn shapes) and IPv4s with typed placeholders.
    * Pure regexp_replace chain — codegen'd, order matters (URLs before
    * bare digit runs so a port number doesn't split a URL; emails first so
    * the URL pattern cannot eat the domain half). Patterns avoid \b and
    * lookaround so they mean the same thing under RE2-class engines. */
  def redactPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val url = regexp_replace(email,
      "https?://[^\\s]+", "<URL>")
    val ip = regexp_replace(url,
      "([0-9]{1,3}\\.){3}[0-9]{1,3}", "<IP>")
    regexp_replace(ip, "[0-9][0-9 ()+.-]{6,}[0-9]", "<NUM>")
  }
}
