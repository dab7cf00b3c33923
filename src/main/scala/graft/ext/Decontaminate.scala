package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Benchmark decontamination — flag corpus documents whose word n-grams
 * overlap an evaluation/benchmark set, the standard "remove eval
 * contamination from training data" stage of LLM data pipelines (n-gram
 * overlap against the eval set, as published in the GPT-3/PaLM/Llama
 * dataset appendices).
 *
 * Scale shape: the benchmark side is SMALL by definition (eval sets are
 * 10⁴–10⁶ n-grams) — it reduces to a bounded distinct-n-gram set in one
 * distributed aggregate and broadcasts once per job. The corpus side is
 * then MAP-ONLY: one projection computes each document's distinct n-grams
 * and counts membership in the broadcast set — zero corpus-side shuffle,
 * no join, no explode; 100 TB of text is read exactly once and never
 * moves. (An exploded corpus-side join would shuffle ~tokens-per-doc rows
 * per document — the thing this design exists to avoid.)
 *
 * Tokenization is the shared law both sides must agree on (see
 * [[NgramLm.normalize]] for the same principle): lowercase, split on
 * whitespace runs, drop empties. ASCII-stable; documented rather than
 * configurable so the benchmark set and the corpus scoring can never
 * disagree.
 *
 * No reference analog (the reference engine ships no text curation);
 * part of the training-data operator tier alongside [[Dedup]] and
 * [[NgramLm]].
 */
object Decontaminate {

  /** Bounded benchmark n-gram set: `n` is pinned so scoring cannot be
    * asked a different shingle width than the set was built with.
    *
    * Representation: SORTED ascending xxhash64 (seed-42 XXH64 over UTF-8
    * bytes — Spark's `xxhash64` on a string column) of each distinct
    * n-gram, not the strings themselves. At the ceiling this is 8 bytes
    * per gram (25M grams = 200 MB primitive array) vs hundreds of MB of
    * boxed JVM strings for the same set; membership is a binary search.
    * Collision odds are ~n²·2⁻⁶⁵ per set (≈10⁻⁸ at 25M grams) — far below
    * any corpus-level concern, and the q72 exact-string oracle would
    * surface one. */
  case class BenchmarkSet(n: Int, hashes: Array[Long]) {
    require(n >= 1, s"n must be >= 1, got $n")
    require(hashes.length <= 1 || {
      var i = 1; var sorted = true
      while (sorted && i < hashes.length) { sorted = hashes(i - 1) < hashes(i); i += 1 }
      sorted
    }, "hashes must be sorted ascending and distinct")

    def contains(gram: String): Boolean =
      java.util.Arrays.binarySearch(hashes, BenchmarkSet.hashGram(gram)) >= 0

    /** (distinct n-grams hit, distinct n-grams total) for one text. */
    def overlap(text: String): (Int, Int) = {
      val grams = distinctNgrams(text, n)
      var hits = 0
      val it = grams.iterator
      while (it.hasNext) if (contains(it.next())) hits += 1
      (hits, grams.size)
    }
  }

  object BenchmarkSet {
    /** The gram→long law shared with the distributed builder: Spark's
      * `xxhash64` (seed-42 XXH64 over the UTF-8 bytes). */
    def hashGram(gram: String): Long = {
      val b = gram.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
    }

    /** Driver-side construction from literal n-grams (tests, tiny sets). */
    def fromStrings(n: Int, ngrams: Set[String]): BenchmarkSet =
      BenchmarkSet(n, ngrams.map(hashGram).toArray.sorted)
  }

  /** Shared tokenization law (must match the documented oracle form
    * `list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')`). */
  private[ext] def tokenize(text: String): Array[String] = {
    if (text == null) return Array.empty
    text.toLowerCase.split("\\s+").filter(_.nonEmpty)
  }

  private[ext] def distinctNgrams(text: String, n: Int): Set[String] = {
    val w = tokenize(text)
    if (w.length < n) return Set.empty
    val out = scala.collection.mutable.HashSet.empty[String]
    var i = 0
    while (i <= w.length - n) {
      val sb = new StringBuilder(w(i))
      var j = 1
      while (j < n) { sb += ' '; sb ++= w(i + j); j += 1 }
      out += sb.result()
      i += 1
    }
    out.toSet
  }

  /** Word-n-gram array column (non-distinct, document order) — used for
    * the benchmark-side distributed aggregate so 100 TB of *benchmark*
    * text would also reduce before moving (it never does in practice, but
    * the shape is right). */
  private[graft] def wordNgrams(c: Column, n: Int): Column = {
    val grams = udf((s: String) => {
      val w = tokenize(s)
      if (w.length < n) Array.empty[String]
      else Array.tabulate(w.length - n + 1)(i => w.slice(i, i + n).mkString(" "))
    })
    grams(c)
  }

  /**
   * Collect the benchmark's distinct word n-grams: one distributed
   * explode + distinct aggregate, then a BOUNDED collect. `maxNgrams` is
   * a hard guard — a benchmark that exceeds it is a usage error (this
   * path broadcasts; an unbounded eval set should be deduplicated or
   * sampled upstream), so the failure is loud and immediate rather than
   * an executor OOM mid-job.
   */
  def benchmarkNgrams(bench: DataFrame, textCol: String, n: Int,
                      maxNgrams: Int = 25000000): BenchmarkSet = {
    // hash on the EXECUTORS (xxhash64 = the BenchmarkSet.hashGram law):
    // only 8-byte longs cross the distinct shuffle and the collect wire
    val distinctHashes = bench
      .select(explode(wordNgrams(col(textCol), n)).as("g"))
      .select(xxhash64(col("g")).as("h"))
      .distinct()
    val hashes = distinctHashes.limit(maxNgrams + 1).collect().map(_.getLong(0))
    require(hashes.length <= maxNgrams,
      s"benchmark has more than $maxNgrams distinct $n-grams — " +
        "dedupe/sample the eval set or raise maxNgrams")
    java.util.Arrays.sort(hashes)
    BenchmarkSet(n, hashes)
  }

  /**
   * Tag each corpus document with its benchmark overlap: adds
   * `ngram_hits` (distinct document n-grams present in the benchmark set)
   * and `ngram_total` (distinct document n-grams). Map-only: the set is
   * broadcast once per job; no corpus-side shuffle.
   */
  def tag(corpus: DataFrame, textCol: String, set: BenchmarkSet): DataFrame = {
    val bc = corpus.sparkSession.sparkContext.broadcast(set)
    val fn = udf((s: String) => bc.value.overlap(s))
    corpus
      .withColumn("_ov", fn(col(textCol)))
      .withColumn("ngram_hits", col("_ov._1").cast("long"))
      .withColumn("ngram_total", col("_ov._2").cast("long"))
      .drop("_ov")
  }

  /** Filter form: drop documents with at least `minHits` distinct
    * benchmark n-grams (the published pipelines use a small absolute
    * count for long n-grams, e.g. any 13-gram collision). */
  def dropContaminated(corpus: DataFrame, textCol: String, set: BenchmarkSet,
                       minHits: Int): DataFrame =
    tag(corpus, textCol, set).filter(col("ngram_hits") < minHits)
      .drop("ngram_hits", "ngram_total")

  // ------------------------------------------------------------------
  // Scale path: benchmark set TOO BIG to broadcast exactly
  // ------------------------------------------------------------------

  /**
   * Contaminated-document detection when the benchmark gram set exceeds
   * the exact-broadcast ceiling (many eval suites at once): a broadcast
   * BLOOM filter (~10 bits/gram at fpp=0.01 vs 64 for the exact hash set)
   * prefilters each document's distinct grams map-side; only the bloom
   * SURVIVORS — true hits plus the fpp sliver — are exploded and verified
   * exactly against the DISTRIBUTED benchmark gram table (a semi join the
   * benchmark side never broadcasts). Zero false negatives by Bloom
   * construction, so after exact verification the output is IDENTICAL to
   * the exact [[tag]] selection: `(idCol, ngram_hits, ngram_total)` for
   * every document with `ngram_hits >= minHits`.
   *
   * Scale shape: the corpus is read ONCE, map-only — what shuffles is
   * (doc, surviving-gram-hash) pairs, i.e. `contamination + fpp·grams`
   * rows, not the corpus and not a full gram explode. The flagged output
   * is small by definition (it's the contamination), so the companion
   * [[dropContaminatedScalable]] applies it as a broadcast anti join —
   * the 100 TB corpus never shuffles at any step.
   */
  def contaminatedIds(corpus: DataFrame, idCol: String, textCol: String,
                      bench: DataFrame, benchTextCol: String, n: Int,
                      minHits: Int, fpp: Double = 0.01,
                      expectedGrams: Long = -1L): DataFrame = {
    val spark = corpus.sparkSession
    // distinct benchmark gram hashes, DISTRIBUTED (used twice: bloom
    // aggregate + verify join) — persisted, 8 bytes/gram
    // localCheckpoint, not persist: materialized once (eager) for the two
    // consumers (bloom aggregate + verify join), and the blocks are
    // GC-reclaimed with the frame instead of pinned for the application's
    // lifetime (a persist here leaks one cached hash set per call)
    val benchHashes = bench
      .select(explode(wordNgrams(col(benchTextCol), n)).as("g"))
      .select(xxhash64(col("g")).as("h"))
      .distinct()
      .localCheckpoint()
    val grams = if (expectedGrams > 0) expectedGrams
                else math.max(benchHashes.count(), 1L)
    val bloom = benchHashes.stat.bloomFilter("h", grams, fpp)
    val bc = spark.sparkContext.broadcast(bloom)
    // map-side candidate extraction: distinct grams hashed by the
    // BenchmarkSet.hashGram law (== the xxhash64 above), bloom-screened
    val cand = udf((s: String) => {
      val g = distinctNgrams(s, n)
      val hits = g.iterator.map(BenchmarkSet.hashGram)
        .filter(bc.value.mightContainLong).toArray
      (hits, g.size)
    })
    corpus
      .select(col(idCol), cand(col(textCol)).as("_c"))
      .select(col(idCol), col("_c._2").cast("long").as("ngram_total"),
        explode(col("_c._1")).as("h"))
      .join(benchHashes, Seq("h"), "left_semi")
      .groupBy(idCol)
      .agg(count(lit(1)).as("ngram_hits"), first("ngram_total").as("ngram_total"))
      .filter(col("ngram_hits") >= minHits)
      .select(col(idCol), col("ngram_hits"), col("ngram_total"))
  }

  /** Filter twin of [[contaminatedIds]]: the flagged set (small by
    * definition) broadcasts into a LEFT ANTI join — same kept rows as
    * [[dropContaminated]] without ever materializing the benchmark set on
    * the driver or shuffling the corpus. */
  def dropContaminatedScalable(corpus: DataFrame, idCol: String, textCol: String,
                               bench: DataFrame, benchTextCol: String, n: Int,
                               minHits: Int, fpp: Double = 0.01): DataFrame = {
    val flagged = contaminatedIds(corpus, idCol, textCol, bench, benchTextCol,
      n, minHits, fpp).select(idCol)
    corpus.join(broadcast(flagged), Seq(idCol), "left_anti")
  }
}
