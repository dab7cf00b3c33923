package graft

import graft.ext.{Bpe, BpeModel}
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Independent naive BPE trainer: operates on the EXPANDED corpus token
    * list (not the word-count table), recounting pairs from scratch each
    * iteration — a deliberately different derivation for the differential
    * test. */
  private def naiveTrain(corpus: Seq[String], numMerges: Int): Seq[(String, String)] = {
    var docs: Seq[Array[String]] = corpus
      .flatMap(_.split("\\s+").filter(_.nonEmpty))
      .map(w => w.map(_.toString).toArray :+ Bpe.EOW)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var stop = false
    while (merges.size < numMerges && !stop) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      docs.foreach { syms =>
        syms.sliding(2).foreach {
          case Array(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + 1
          case _ =>
        }
      }
      val eligible = counts.filter(_._2 >= 2)
      if (eligible.isEmpty) stop = true
      else {
        val best = eligible.minBy { case (p, c) => (-c, p) }._1
        merges += best
        docs = docs.map(Bpe.mergePair(_, best))
      }
    }
    merges.toSeq
  }

  val corpus = Seq(
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wider wider new new")

  test("training matches an independent expanded-corpus implementation") {
    val viaWordCounts = Bpe.trainFromWordCounts(
      corpus.flatMap(_.split("\\s+")).groupBy(identity).view
        .mapValues(_.size.toLong).toSeq, numMerges = 12)
    val naive = naiveTrain(corpus, numMerges = 12)
    assert(viaWordCounts.merges === naive,
      s"word-count path ${viaWordCounts.merges} != naive $naive")
  }

  test("spark-trained model: deterministic, and equals driver-side training") {
    val df = corpus.toDF("text")
    val m1 = Bpe.train(df, "text", numMerges = 12)
    val m2 = Bpe.train(df, "text", numMerges = 12)
    assert(m1.merges === m2.merges)
    assert(m1.merges === naiveTrain(corpus, 12))
  }

  test("encodeWord: lossless round-trip and full-merge of trained words") {
    val m = Bpe.train(corpus.toDF("text"), "text", numMerges = 30)
    for (w <- Seq("low", "newest", "wider", "lowest", "unseen", "a")) {
      val toks = m.encodeWord(w)
      assert(toks.mkString("") === w + Bpe.EOW, s"round-trip broke for $w: $toks")
    }
    // high-frequency trained words compress to a single token
    assert(m.encodeWord("low") === Seq("low" + Bpe.EOW))
    assert(m.encodeWord("newest") === Seq("newest" + Bpe.EOW))
  }

  test("more merges never increases token count on the training corpus") {
    val df = corpus.toDF("text")
    def total(n: Int): Long = {
      val m = Bpe.train(df, "text", numMerges = n)
      df.select(sum(m.tokenCount(col("text")))).as[Long].head()
    }
    val t0 = total(0); val t5 = total(5); val t20 = total(20)
    assert(t0 >= t5 && t5 >= t20, s"$t0 >= $t5 >= $t20 violated")
    // zero merges = chars + one EOW per word
    val chars = corpus.flatMap(_.split("\\s+")).map(_.length + 1).sum
    assert(t0 === chars.toLong)
  }

  test("distributed encode on real documents; null and empty laws") {
    val docs = sf("sf0.001", "documents")
    val m = Bpe.train(docs, "text", numMerges = 100, maxWords = 5000)
    assert(m.vocabSize === 100)
    val stats = docs.select(
        m.tokenCount(col("text")).as("bpe"),
        length(col("text")).as("chars"),
        graft.ext.TextAnalysis.tokenCount(col("text")).as("words"))
      .agg(sum("bpe"), sum("chars"), sum("words"))
      .as[(Long, Long, Long)].head()
    assert(stats._1 > 0)
    assert(stats._1 < stats._2, "BPE tokens must compress below chars")
    assert(stats._1 >= stats._3, "BPE tokens cannot go below whitespace words")
    val nulls = Seq[String](null, "", "  ").toDF("text")
      .select(m.tokens(col("text")).as("t"), m.tokenCount(col("text")).as("n"))
      .collect()
    assert(nulls(0).isNullAt(0) && nulls(0).isNullAt(1))
    assert(nulls(1).getSeq[String](0) === Seq.empty)
    assert(nulls(2).getSeq[String](0) === Seq.empty)
  }

  test("runCli: trains + persists; reload path reproduces identical tokenization") {
    val out = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    val (m1, t1) = Bpe.runCli(spark, "/root/testdata/sf0.001/documents.parquet",
      "text", s"$out/a", numMerges = 40, maxWords = 5000, modelPath = None)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$out/a/bpe_model.json")))
    val tokenized = spark.read.parquet(s"$out/a/tokenized")
    assert(tokenized.columns.contains("bpe_tokens") && tokenized.columns.contains("bpe_token_cnt"))
    // second run LOADS the saved model instead of retraining -> same totals
    val (m2, t2) = Bpe.runCli(spark, "/root/testdata/sf0.001/documents.parquet",
      "text", s"$out/b", numMerges = 999, maxWords = 1, // ignored when loading
      modelPath = Some(s"$out/a/bpe_model.json"))
    assert(m2.merges === m1.merges)
    assert(t2 === t1)
  }

  test("vocabularyFit: in-distribution text scores near 1, OOV junk near 0") {
    val m = Bpe.train(corpus.toDF("text"), "text", numMerges = 40)
    val scores = Seq(
      "low lower newest new",        // fully in-vocab
      "zqxj vbnw kfhd pqrs")         // character soup
      .toDF("text").select(round(m.vocabularyFit(col("text")), 4))
      .collect().map(_.getDouble(0))
    assert(scores(0) > 0.8, s"in-vocab fit ${scores(0)}")
    assert(scores(1) < 0.3, s"junk fit ${scores(1)}")
    assert(scores(0) > scores(1) * 2)
  }

  test("merge-list JSON round-trip (incl. escapes)") {
    val m = BpeModel(IndexedSeq(("a", "b"), ("\"q\\", "</w>"), ("ab", "c</w>")),
      IndexedSeq("a", "b", "c", "\"q\\"))
    val back = BpeModel.fromJsonMerges(m.toJsonMerges)
    assert(back.merges === m.merges)
    assert(back.baseChars === m.baseChars)
    assert(back.encodeWord("abc") === m.encodeWord("abc"))
    // legacy bare-array form still parses (empty base alphabet)
    val legacy = BpeModel.fromJsonMerges("""[["a","b"],["ab","c"]]""")
    assert(legacy.merges === IndexedSeq(("a", "b"), ("ab", "c")))
    assert(legacy.baseChars.isEmpty)
  }

  test("token ids: stable across save/load, decodable, unseen chars -> <unk>") {
    val m = Bpe.train(corpus.toDF("text"), "text", numMerges = 30)
    assert(m.idVocabSize > 2)
    // ids decode back to exactly the string tokens
    val toks = m.encode("lower newest")
    val ids = m.encodeIds("lower newest")
    assert(ids.map(m.idToToken) === toks)
    assert(ids.forall(i => i > 0 && i < m.idVocabSize)) // all in-vocab
    // unseen character maps to <unk>=0 (and only that position)
    val idsUnk = m.encodeIds("low@")
    assert(idsUnk.contains(0), s"no unk in $idsUnk")
    // save/load reproduces identical ids (the downstream-trainer contract)
    val out = java.nio.file.Files.createTempDirectory("graft-bpe-ids").toString
    Bpe.save(spark, m, s"$out/m.json")
    val re = Bpe.load(spark, s"$out/m.json")
    assert(re.idToToken === m.idToToken)
    assert(re.encodeIds("lower newest unseen中") === m.encodeIds("lower newest unseen中"))
    // Column API parity
    val viaCol = Seq("lower newest").toDF("text")
      .select(m.tokenIds(col("text"))).head().getSeq[Int](0)
    assert(viaCol === ids)
  }
}
