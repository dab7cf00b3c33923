package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/**
 * Real byte-pair-encoding tokenizer, trained over the corpus.
 *
 * Split of labor (the shape SentencePiece/HF use, distributed):
 *  - Spark does the scale-critical part: the word-frequency table over the
 *    whole corpus — one partial+final hash aggregate plus a top-K
 *    (TakeOrderedAndProject), so 100 TB of text reduces to <= `maxWords`
 *    (word, count) rows.
 *  - The driver learns merges from that bounded table (classic BPE: repeatedly
 *    merge the most frequent adjacent symbol pair). BPE over the word-count
 *    table is EXACTLY BPE over the corpus, because merges never cross word
 *    boundaries.
 *  - Encoding runs distributed again: the merge-rank map rides the task
 *    closure (a few hundred KB at vocab sizes that matter).
 *
 * Determinism: word top-K ties break on the word, merge-count ties break on
 * the pair lexicographically — same corpus, same model, bit-for-bit.
 */
object Bpe {

  /** End-of-word marker, so "low est" and "lowest" learn different merges. */
  val EOW = "</w>"

  /** Corpus word-frequency table, capped to the `maxWords` most frequent
    * (frequency-dominant words decide merges; the tail can't change them
    * much and capping bounds driver memory). */
  private[graft] def wordCountsPlan(df: DataFrame, textCol: String,
                                    maxWords: Int): DataFrame =
    df.select(explode(split(col(textCol), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w").asc)
      .limit(maxWords)

  def wordCounts(df: DataFrame, textCol: String, maxWords: Int): Array[(String, Long)] = {
    import df.sparkSession.implicits._
    wordCountsPlan(df, textCol, maxWords).as[(String, Long)].collect()
  }

  /** Train on a corpus column: one Spark aggregation, then driver-side
    * merge learning. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            maxWords: Int = 50000): BpeModel =
    trainFromWordCounts(wordCounts(df, textCol, maxWords), numMerges)

  /** Classic BPE merge learning over a (word, count) table. Stops early when
    * no pair occurs at least twice. */
  def trainFromWordCounts(wc: Seq[(String, Long)], numMerges: Int): BpeModel = {
    var words: Array[(Array[String], Long)] =
      wc.map { case (w, c) => (w.map(_.toString).toArray :+ EOW, c) }.toArray
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.size < numMerges && !done) {
      val pairs = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairs.update(p, pairs.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      val best = pairs.filter(_._2 >= 2).reduceOption { (a, b) =>
        if (a._2 != b._2) { if (a._2 > b._2) a else b }
        else if (Ordering[(String, String)].lt(a._1, b._1)) a else b
      }
      best match {
        case None => done = true
        case Some((pair, _)) =>
          merges += pair
          words = words.map { case (syms, c) => (mergePair(syms, pair), c) }
      }
    }
    val base = wc.flatMap(_._1.map(_.toString)).distinct.sorted.toIndexedSeq
    BpeModel(merges.toIndexedSeq, base)
  }

  /** Persist a model next to bundle artifacts (works on any Hadoop FS). */
  def save(spark: org.apache.spark.sql.SparkSession, model: BpeModel, path: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(path), true)
    out.write(model.toJsonMerges.getBytes("UTF-8")); out.close()
  }

  def load(spark: org.apache.spark.sql.SparkSession, path: String): BpeModel = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new org.apache.hadoop.fs.Path(path))
    val bytes = in.readAllBytes(); in.close()
    BpeModel.fromJsonMerges(new String(bytes, "UTF-8"))
  }

  /**
   * CLI body for `--mode tokenize`: train (or load `--bpe-model`), write
   * tokenized parquet (doc columns + bpe_tokens + bpe_token_cnt) and persist
   * the model as `bpe_model.json` for reuse — the tokenizer as a corpus
   * asset, not a per-job throwaway.
   */
  def runCli(spark: org.apache.spark.sql.SparkSession, input: String, textCol: String,
             outDir: String, numMerges: Int, maxWords: Int,
             modelPath: Option[String]): (BpeModel, Long) = {
    val df = spark.read.parquet(input)
    require(df.columns.contains(textCol), s"--text-col $textCol not in ${df.columns.mkString(",")}")
    val model = modelPath match {
      case Some(p) => load(spark, p)
      case None => train(df, textCol, numMerges, maxWords)
    }
    val out = df
      .withColumn("bpe_tokens", model.tokens(col(textCol)))
      .withColumn("bpe_token_ids", model.tokenIds(col(textCol)))
      .withColumn("bpe_token_cnt", size(col("bpe_tokens")))
    out.write.mode("overwrite").parquet(s"$outDir/tokenized")
    save(spark, model, s"$outDir/bpe_model.json")
    val total = spark.read.parquet(s"$outDir/tokenized")
      .agg(sum("bpe_token_cnt")).head().getLong(0)
    (model, total)
  }

  private[graft] def mergePair(syms: Array[String], pair: (String, String)): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }
}

/** A trained BPE model: an ordered merge list plus the training base
  * alphabet (for the id vocabulary). Serializable; the encode UDFs ship it
  * via a broadcast (once per executor), never per-task closures. */
case class BpeModel(merges: IndexedSeq[(String, String)],
                    baseChars: IndexedSeq[String] = IndexedSeq.empty)
  extends Serializable {

  @transient private lazy val rank: Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  def vocabSize: Int = merges.size

  /** Deterministic id vocabulary: 0 = <unk> (chars unseen in training),
    * then EOW, the sorted base alphabet, and each merge's output symbol in
    * merge order (first-wins when two merges yield the same string). The
    * same model therefore assigns the same ids on every cluster and after
    * every save/load — the contract a downstream trainer needs. */
  @transient lazy val idToToken: IndexedSeq[String] = {
    val out = mutable.ArrayBuffer("<unk>", Bpe.EOW)
    val seen = mutable.HashSet("<unk>", Bpe.EOW)
    (baseChars.filterNot(seen) ++ merges.map { case (a, b) => a + b }).foreach { t =>
      if (seen.add(t)) out += t
    }
    out.toIndexedSeq
  }
  @transient private lazy val tokenToId: Map[String, Int] =
    idToToken.zipWithIndex.toMap

  def idVocabSize: Int = idToToken.size

  /** Packed int-id encoding (unseen symbols -> 0 = <unk>). */
  def encodeIds(text: String): Seq[Int] =
    encode(text).map(t => tokenToId.getOrElse(t, 0))

  /** array<int> token ids (null text -> null) — the trainer-ready form.
    * The model rides a BROADCAST (one ship per executor, not one per task
    * closure); `rank`/`tokenToId` rebuild lazily executor-side. */
  def tokenIds(c: Column): Column = {
    val bc = org.apache.spark.sql.SparkSession.active
      .sparkContext.broadcast(this)
    val f = udf((s: String) => if (s == null) null else bc.value.encodeIds(s))
    f(c)
  }

  /** Greedy lowest-rank-first merging of one word (the GPT-2 encode loop) —
    * reproduces exactly the segmentation training would give the word. */
  def encodeWord(word: String): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    var syms: Vector[String] = word.map(_.toString).toVector :+ Bpe.EOW
    var continue = syms.length > 1 && merges.nonEmpty
    while (continue) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) continue = false
      else {
        syms = syms.patch(bestIdx, Seq(syms(bestIdx) + syms(bestIdx + 1)), 2)
        if (syms.length < 2) continue = false
      }
    }
    syms
  }

  /** Whitespace-split then per-word encode (merges never cross words). */
  def encode(text: String): Seq[String] =
    text.split("\\s+").iterator.filter(_.nonEmpty).flatMap(encodeWord).toSeq

  /** array<string> of BPE tokens (null text -> null); broadcast like
    * [[tokenIds]]. */
  def tokens(c: Column): Column = {
    val bc = org.apache.spark.sql.SparkSession.active
      .sparkContext.broadcast(this)
    val f = udf((s: String) => if (s == null) null else bc.value.encode(s))
    f(c)
  }

  /** Subword token count (null text -> null via size-of-null). */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** Vocabulary fit in (0,1]: whitespace words / BPE tokens. Text drawn
    * from the training distribution merges toward one token per word
    * (fit -> 1); out-of-vocabulary junk stays character-split (fit -> 0).
    * A trained-tokenizer quality signal with no extra model. */
  def vocabularyFit(c: Column): Column = {
    val ws = size(split(c, "\\s+"))
    when(tokenCount(c) === 0, 0.0)
      .otherwise(ws.cast("double") / tokenCount(c).cast("double"))
  }

  /** Model as JSON (merge list + base alphabet) for manifest persistence.
    * Reader accepts both this form and the legacy bare merge array. */
  def toJsonMerges: String = {
    val ms = merges.map { case (a, b) =>
      s"""["${escape(a)}","${escape(b)}"]"""
    }.mkString("[", ",", "]")
    val bs = baseChars.map(c => s""""${escape(c)}"""").mkString("[", ",", "]")
    s"""{"base":$bs,"merges":$ms}"""
  }

  private def escape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
}

object BpeModel {
  /** Inverse of toJsonMerges (tiny hand parser; merge symbols are short).
    * Accepts the current {"base":[...],"merges":[...]} form and the legacy
    * bare merge-pair array (empty base alphabet). */
  def fromJsonMerges(json: String): BpeModel = {
    val baseIdx = json.indexOf("\"base\":")
    val mergesIdx = json.indexOf("\"merges\":")
    val (baseJson, mergesJson) =
      if (baseIdx >= 0 && mergesIdx > baseIdx)
        (json.substring(baseIdx, mergesIdx), json.substring(mergesIdx))
      else ("", json)
    val pairs = mutable.ArrayBuffer.empty[(String, String)]
    val m = java.util.regex.Pattern
      .compile("\\[\"((?:[^\"\\\\]|\\\\.)*)\",\"((?:[^\"\\\\]|\\\\.)*)\"\\]")
      .matcher(mergesJson)
    while (m.find()) pairs += ((unescape(m.group(1)), unescape(m.group(2))))
    val base = mutable.ArrayBuffer.empty[String]
    val bm = java.util.regex.Pattern
      .compile("\"((?:[^\"\\\\]|\\\\.)*)\"").matcher(baseJson)
    while (bm.find()) if (bm.group(1) != "base") base += unescape(bm.group(1))
    BpeModel(pairs.toIndexedSeq, base.toIndexedSeq)
  }

  private def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s(i) == '\\' && i + 1 < s.length) {
        s(i + 1) match {
          case '"' => sb += '"'; i += 2
          case '\\' => sb += '\\'; i += 2
          case 'u' => sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6
          case c => sb += c; i += 2
        }
      } else { sb += s(i); i += 1 }
    }
    sb.toString
  }
}
