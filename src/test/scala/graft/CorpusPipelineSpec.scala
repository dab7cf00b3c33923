package graft

import graft.pipeline.CorpusPipeline
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("stages drop exactly the planted junk, exact clones, and near-clones") {
    val rnd = new scala.util.Random(31)
    def sentence(n: Int) =
      (0 until n).map(_ => s"the w${rnd.nextInt(400)} of and to a").mkString(" ")
    val clean = (0L until 40L).map(i => (i, "src", sentence(12)))
    val junk = (100L until 110L).map(i => (i, "src", "x"))           // fails quality
    val exactClones = clean.take(5).map { case (i, s, t) => (i + 200L, s, t) }
    val nearClones = clean.slice(5, 10).map { case (i, s, t) =>
      (i + 300L, s, t + " zzz") }                                    // high jaccard
    val input = Files.createTempDirectory("graft-cp-in").toString
    (clean ++ junk ++ exactClones ++ nearClones)
      .toDF("doc_id", "source", "text").write.mode("overwrite").parquet(input)

    val out = Files.createTempDirectory("graft-cp-out").toString
    val st = CorpusPipeline.run(spark, input, out, "corpus",
      numShards = 3, partitionMultiples = 2, qualityMin = 0.3,
      nearDupThreshold = 0.8, bpeMerges = 60, bpeMaxWords = 2000)

    assert(st.input === 60L)
    assert(st.afterQuality === 50L, s"junk not filtered: $st")       // -10 junk
    assert(st.afterExact === 45L, s"exact clones not dropped: $st")  // -5 clones
    assert(st.afterNearDup === 40L, s"near clones not dropped: $st") // -5 near
    assert(st.totalTokens > 0)
    assert(st.bundle.totalDocs === 40L)

    // bundle is columnar with token columns + vocab_fit; model persisted
    val back = spark.read.parquet(s"$out/corpus/data")
    assert(back.columns.contains("bpe_token_cnt") && back.columns.contains("vocab_fit"))
    assert(back.agg(sum("bpe_token_cnt")).head().getLong(0) === st.totalTokens)
    assert(Files.exists(Paths.get(s"$out/corpus/bpe_model.json")))
    // surviving ids are exactly the 40 originals (canonical-minimum law)
    val ids = back.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids === (0L until 40L).toSet)

    // yield accounting persisted next to the bundle — the artifact form of
    // the returned Stats (a curation team reads this, not driver stdout)
    val rec = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Files.readString(Paths.get(s"$out/corpus/pipeline_stats.json")))
    assert(rec.get("input").asLong === st.input)
    assert(rec.get("after_quality").asLong === st.afterQuality)
    assert(rec.get("after_exact").asLong === st.afterExact)
    assert(rec.get("after_neardup").asLong === st.afterNearDup)
    assert(rec.get("total_tokens").asLong === st.totalTokens)
    assert(rec.get("bundle_docs").asLong === st.bundle.totalDocs)
    assert(rec.get("after_mix").asLong === -1L) // stage off -> -1 recorded
  }

  test("packMaxLen: survivors' token ids packed under budget, nothing lost") {
    val rnd = new scala.util.Random(53)
    def sentence(n: Int) =
      (0 until n).map(_ => s"the w${rnd.nextInt(200)} of and to a").mkString(" ")
    val docs = (0L until 30L).map(i => (i, "src", sentence(4 + rnd.nextInt(12))))
    val input = Files.createTempDirectory("graft-cp-pack-in").toString
    docs.toDF("doc_id", "source", "text").write.mode("overwrite").parquet(input)

    val out = Files.createTempDirectory("graft-cp-pack-out").toString
    val st = CorpusPipeline.run(spark, input, out, "corpus",
      numShards = 2, partitionMultiples = 2, qualityMin = 0.3,
      bpeMerges = 40, bpeMaxWords = 2000,
      packMaxLen = Some(64), packBuckets = 2)
    assert(st.packedSeqs > 0)

    val packed = spark.read.parquet(s"$out/corpus/packed")
    assert(packed.count() === st.packedSeqs)
    assert(packed.filter(col("n_tokens") > 64).count() === 0)
    // every surviving doc's token count is fully represented in the packed
    // artifact (coverage across the pipeline boundary, bundle as truth)
    val bundleTok = spark.read.parquet(s"$out/corpus/data")
      .agg(sum("bpe_token_cnt")).head().getLong(0)
    val packedTok = packed.agg(sum("n_tokens")).head().getLong(0)
    assert(bundleTok === packedTok, s"bundle $bundleTok vs packed $packedTok")
  }

  test("packStyle=chunk: full windows + EOD accounting; loader columns reset at spans") {
    val rnd = new scala.util.Random(57)
    def sentence(n: Int) =
      (0 until n).map(_ => s"the w${rnd.nextInt(200)} of and to a").mkString(" ")
    val docs = (0L until 30L).map(i => (i, "src", sentence(4 + rnd.nextInt(12))))
    val input = Files.createTempDirectory("graft-cp-chunk-in").toString
    docs.toDF("doc_id", "source", "text").write.mode("overwrite").parquet(input)

    val out = Files.createTempDirectory("graft-cp-chunk-out").toString
    val st = CorpusPipeline.run(spark, input, out, "corpus",
      numShards = 2, partitionMultiples = 2, qualityMin = 0.3,
      bpeMerges = 40, bpeMaxWords = 2000,
      packMaxLen = Some(64), packStyle = "chunk", packEodToken = Some(-1),
      packLoaderCols = true)
    val packed = spark.read.parquet(s"$out/corpus/packed").orderBy("seq_id")
    assert(packed.count() === st.packedSeqs && st.packedSeqs > 0)
    // every window full except the last; tokens = bundle tokens + one EOD
    // per surviving doc
    val rows = packed.collect()
    rows.dropRight(1).foreach(r => assert(r.getAs[Int]("n_tokens") === 64))
    val bundle = spark.read.parquet(s"$out/corpus/data")
    val bundleTok = bundle.agg(sum("bpe_token_cnt")).head().getLong(0)
    val nDocs = bundle.count()
    assert(rows.map(_.getAs[Int]("n_tokens")).sum === bundleTok + nDocs,
      "chunk stream must hold every token plus one EOD per doc")
    // packLoaderCols=true bakes the loader columns into the export — with
    // the CHUNK convention (withChunkLoaderColumns): positions are the
    // plain window index (a continued piece does not restart at 0),
    // doc_index is the span slot. The per-span-reset variant
    // (withLoaderColumns) is the BFD convention and does NOT apply here.
    val loaded = spark.read.parquet(s"$out/corpus/packed")
      .orderBy("seq_id").collect()
    loaded.foreach { r =>
      val n = r.getAs[Int]("n_tokens")
      val pos = r.getAs[scala.collection.Seq[Int]]("position_ids")
      assert(pos === (0 until n), "position_ids must be the plain window index")
      val dix = r.getAs[scala.collection.Seq[Int]]("doc_index")
      val spans = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("doc_spans")
      spans.zipWithIndex.foreach { case (sp, slot) =>
        val b = sp.getAs[Int]("begin"); val e = sp.getAs[Int]("end")
        assert(dix.slice(b, e).forall(_ == slot),
          s"doc_index not block-diagonal at span [$b,$e)")
      }
    }
  }

  test("optional stages: PII redacted before the bundle; LM filter drops fluent-looking junk") {
    val rnd = new scala.util.Random(41)
    def sentence(n: Int) =
      (0 until n).map(_ => s"the w${rnd.nextInt(400)} of and to a").mkString(" ")
    // gibberish shaped to PASS surface quality (long, low punct, has
    // stopwords) but be out-of-distribution for the char LM
    def gibberish() = (0 until 12)
      .map(_ => "the " + (0 until 8).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
      .mkString(" ")
    val clean = (0L until 40L).map(i => (i, "src", sentence(12)))
    val pii = (500L until 505L).map(i =>
      (i, "src", sentence(10) + " contact bob@example.com or https://ex.com/x now " +
        sentence(4)))
    val fluentJunk = (600L until 610L).map(i => (i, "src", gibberish()))
    val input = Files.createTempDirectory("graft-cp2-in").toString
    (clean ++ pii ++ fluentJunk)
      .toDF("doc_id", "source", "text").write.mode("overwrite").parquet(input)

    // calibrate the LM threshold the way an operator would: train on the
    // surface-quality-passed corpus, split clean vs junk means, cut midway
    // (the pipeline retrains the same model on the same surface set)
    val allDf = spark.read.parquet(input)
      .withColumn("text", graft.ext.TextAnalysis.redactPii(col("text")))
    val surface = allDf.filter(
      graft.ext.TextAnalysis.qualityScoreRaw(col("text")) >= 0.3)
    val lm = graft.ext.NgramLm.train(surface, "text")
    val scored = graft.ext.NgramLm.score(surface, "text", lm)
      .select("doc_id", "lm_score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    val cleanMean = scored.filter(_._1 < 600L).map(_._2).sum /
      scored.count(_._1 < 600L)
    val junkMean = scored.filter(_._1 >= 600L).map(_._2).sum /
      scored.count(_._1 >= 600L)
    assert(cleanMean > junkMean + 0.3,
      f"no LM separation on planted gibberish: clean $cleanMean%.2f junk $junkMean%.2f")
    val cut = (cleanMean + junkMean) / 2

    val out = Files.createTempDirectory("graft-cp2-out").toString
    val st = CorpusPipeline.run(spark, input, out, "corpus2",
      numShards = 3, partitionMultiples = 2, qualityMin = 0.3,
      nearDupThreshold = 0.8, bpeMerges = 60, bpeMaxWords = 2000,
      redactPii = true, lmMinScore = Some(cut))
    assert(st.afterQuality === 55L, s"gibberish should pass surface quality: $st")
    assert(st.afterLm >= 40L && st.afterLm <= 50L,
      s"LM filter should drop most gibberish, keep clean+pii docs: $st")
    val back = spark.read.parquet(s"$out/corpus2/data")
    val texts = back.filter(col("doc_id") >= 500L && col("doc_id") < 505L)
      .select("text").collect().map(_.getString(0))
    assert(texts.nonEmpty)
    assert(texts.forall(t => t.contains("<EMAIL>") && t.contains("<URL>")), texts.head)
    assert(texts.forall(t => !t.contains("bob@example.com") && !t.contains("https://")))
    // gibberish ids gone from the bundle
    val ids = back.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.intersect((600L until 610L).toSet).size <= 2, s"junk survived: $ids")
  }

  test("embedding near-dup stage: drops planted semantic clones MinHash cannot see") {
    val rnd = new scala.util.Random(53)
    def sentence(n: Int) =
      (0 until n).map(_ => s"the w${rnd.nextInt(400)} of and to a").mkString(" ")
    val dim = 16
    def vec(seed: Int): Seq[Float] = {
      val r = new scala.util.Random(seed)
      Seq.fill(dim)(r.nextGaussian().toFloat)
    }
    def jitter(v: Seq[Float], eps: Double, seed: Int): Seq[Float] = {
      val r = new scala.util.Random(seed)
      v.map(x => (x + eps * r.nextGaussian()).toFloat)
    }
    val clean = (0L until 40L).map(i => (i, sentence(12), vec(i.toInt)))
    // "paraphrases": DIFFERENT surface text (fresh random sentence — near-zero
    // shingle overlap) but near-identical embeddings of docs 0..4
    val paraphrases = (0L until 5L).map(i =>
      (i + 700L, sentence(12), jitter(vec(i.toInt), 0.01, 900 + i.toInt)))
    val input = Files.createTempDirectory("graft-cp3-in").toString
    (clean ++ paraphrases).toDF("doc_id", "text", "embedding")
      .write.mode("overwrite").parquet(input)

    // minhash path: paraphrases SURVIVE (no shingle overlap)
    val outM = Files.createTempDirectory("graft-cp3-mh").toString
    val stM = CorpusPipeline.run(spark, input, outM, "c_mh",
      numShards = 2, partitionMultiples = 2, qualityMin = 0.3,
      nearDupThreshold = 0.8, bpeMerges = 60, bpeMaxWords = 2000)
    assert(stM.afterNearDup === 45L, s"minhash should keep paraphrases: $stM")

    // embedding path: exactly the 5 planted paraphrases (the higher ids) drop
    val outE = Files.createTempDirectory("graft-cp3-em").toString
    val stE = CorpusPipeline.run(spark, input, outE, "c_em",
      numShards = 2, partitionMultiples = 2, qualityMin = 0.3,
      nearDupThreshold = 0.95, bpeMerges = 60, bpeMaxWords = 2000,
      nearDupMethod = "embedding")
    assert(stE.afterNearDup === 40L, s"embedding path should drop paraphrases: $stE")
    val ids = spark.read.parquet(s"$outE/c_em/data")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids === (0L until 40L).toSet, s"canonical-minimum law violated: $ids")

    // ---- round-16 scale-gate routing law (ADVICE/VERDICT task 3) ----
    // Above embedGateDocs, the strict embedding path must REFUSE without
    // the staged opt-in (the measured superlinear decade: 4,197 s /
    // ENOSPC at 10M), citing the alternatives; with embedStagedPasses
    // set, it runs the staged table-group form and drops the SAME docs.
    val outG = Files.createTempDirectory("graft-cp3-gate").toString
    val ex = intercept[IllegalArgumentException] {
      CorpusPipeline.run(spark, input, outG, "c_gate",
        numShards = 2, partitionMultiples = 2, qualityMin = 0.3,
        nearDupThreshold = 0.95, bpeMerges = 60, bpeMaxWords = 2000,
        nearDupMethod = "embedding", embedGateDocs = 10L)
    }
    assert(ex.getMessage.contains("strict-LSH scale gate"), ex.getMessage)
    assert(ex.getMessage.contains("embed-staged-passes"), ex.getMessage)
    assert(ex.getMessage.contains("minhash"), ex.getMessage)
    val outS = Files.createTempDirectory("graft-cp3-staged").toString
    val stS = CorpusPipeline.run(spark, input, outS, "c_st",
      numShards = 2, partitionMultiples = 2, qualityMin = 0.3,
      nearDupThreshold = 0.95, bpeMerges = 60, bpeMaxWords = 2000,
      nearDupMethod = "embedding", embedGateDocs = 10L,
      embedStagedPasses = Some(2))
    assert(stS.afterNearDup === 40L,
      s"staged opt-in past the gate must drop the same paraphrases: $stS")
    val idsS = spark.read.parquet(s"$outS/c_st/data")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(idsS === ids, "staged pass set must equal the single-pass drops")
  }

  test("nearDupMethod=semantic: pipeline drops == batch semDedup drops " +
      "against the same frozen artifact") {
    val rnd = new scala.util.Random(41)
    def sentence(n: Int) =
      (0 until n).map(_ => s"alpha w${rnd.nextInt(500)} beta gamma").mkString(" ")
    val dim = 16
    def vec(i: Int): Seq[Float] = {
      val r = new scala.util.Random(1000 + i)
      Seq.fill(dim)(r.nextGaussian().toFloat)
    }
    def jitter(v: Seq[Float], eps: Double, seed: Int): Seq[Float] = {
      val r = new scala.util.Random(seed)
      v.map(x => (x + eps * r.nextGaussian()).toFloat)
    }
    // docs 0..3 sit EXACTLY at the 4 centroids (label margins are the
    // inter-centroid cosines, far beyond any jitter), 4..39 are random
    val clean = (0L until 40L).map { i =>
      val v = if (i < 4) vec(100 + i.toInt) else vec(i.toInt)
      (i, sentence(12), v)
    }
    // semantic paraphrases of docs 0..3: fresh text, near-identical
    // vectors — guaranteed same frozen label as their originals
    val paraphrases = (0L until 4L).map(i =>
      (i + 700L, sentence(12), jitter(vec(100 + i.toInt), 0.01, 800 + i.toInt)))
    val input = Files.createTempDirectory("graft-cp-sem-in").toString
    val all = (clean ++ paraphrases).toDF("doc_id", "text", "embedding")
    all.write.mode("overwrite").parquet(input)
    // frozen centroid artifact (same layout as an index's centroids/)
    val centPath = Files.createTempDirectory("graft-cp-sem-cent").toString
    (0 until 4).map(c => (c, vec(100 + c).map(_.toDouble)))
      .toDF("cent_id", "centv").write.mode("overwrite").parquet(centPath)
    val out = Files.createTempDirectory("graft-cp-sem").toString
    val st = CorpusPipeline.run(spark, input, out, "c_sem",
      numShards = 2, partitionMultiples = 2, qualityMin = 0.3,
      nearDupThreshold = 0.95, bpeMerges = 60, bpeMaxWords = 2000,
      nearDupMethod = "semantic", semDedupCentroids = Some(centPath))
    // law: the pipeline's kept ids == the standalone operator's kept ids
    // on the same corpus/artifact/threshold (the quality gate kept all 45)
    val cents = graft.ext.Similarity.loadClusterCentroids(spark, centPath)
    val expected = graft.ext.Dedup.semDedup(all, "doc_id", "embedding",
        cents, threshold = 0.95)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val ids = spark.read.parquet(s"$out/c_sem/data")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(st.afterNearDup === expected.size.toLong, s"stats: $st")
    assert(ids === expected, "pipeline kept set != semDedup kept set")
    // the 4 planted paraphrases are among the drops
    assert((700L until 704L).forall(!ids.contains(_)))
  }

  test("nearDupMethod=semantic with semDedupKeep=low-similarity: the " +
      "farthest-from-centroid representative survives; pipeline == operator") {
    val rnd = new scala.util.Random(43)
    def sentence(n: Int) =
      (0 until n).map(_ => s"alpha w${rnd.nextInt(500)} beta gamma").mkString(" ")
    val dim = 16
    def vec(i: Int): Seq[Float] = {
      val r = new scala.util.Random(1000 + i)
      Seq.fill(dim)(r.nextGaussian().toFloat)
    }
    def jitter(v: Seq[Float], eps: Double, seed: Int): Seq[Float] = {
      val r = new scala.util.Random(seed)
      v.map(x => (x + eps * r.nextGaussian()).toFloat)
    }
    // originals 0..3 sit EXACTLY at the centroids (csim maximal); their
    // paraphrases are jittered (strictly lower csim) — keep-first would
    // keep the smaller-id originals, low-similarity must keep the
    // paraphrases instead
    val clean = (0L until 40L).map { i =>
      val v = if (i < 4) vec(100 + i.toInt) else vec(i.toInt)
      (i, sentence(12), v)
    }
    val paraphrases = (0L until 4L).map(i =>
      (i + 700L, sentence(12), jitter(vec(100 + i.toInt), 0.01, 800 + i.toInt)))
    val input = Files.createTempDirectory("graft-cp-skf-in").toString
    val all = (clean ++ paraphrases).toDF("doc_id", "text", "embedding")
    all.write.mode("overwrite").parquet(input)
    val centPath = Files.createTempDirectory("graft-cp-skf-cent").toString
    (0 until 4).map(c => (c, vec(100 + c).map(_.toDouble)))
      .toDF("cent_id", "centv").write.mode("overwrite").parquet(centPath)
    val out = Files.createTempDirectory("graft-cp-skf").toString
    CorpusPipeline.run(spark, input, out, "c_skf",
      numShards = 2, partitionMultiples = 2, qualityMin = 0.3,
      nearDupThreshold = 0.95, bpeMerges = 60, bpeMaxWords = 2000,
      nearDupMethod = "semantic", semDedupCentroids = Some(centPath),
      semDedupKeep = "low-similarity")
    val cents = graft.ext.Similarity.loadClusterCentroids(spark, centPath)
    val expected = graft.ext.Dedup.semDedup(all, "doc_id", "embedding",
        cents, threshold = 0.95, keep = "low-similarity")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val ids = spark.read.parquet(s"$out/c_skf/data")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids === expected, "pipeline kept set != low-similarity semDedup")
    // the policy flipped the representatives: paraphrases survive,
    // at-centroid originals drop
    assert((700L until 704L).forall(ids.contains),
      "jittered paraphrases (lower centroid-sim) must survive")
    assert((0L until 4L).forall(!ids.contains(_)),
      "at-centroid originals must drop under keep=low-similarity")
  }

  test("clusterDrop: star component keeps one representative; pairwise keeps both spokes") {
    val rnd = new scala.util.Random(67)
    def sentence(n: Int) =
      (0 until n).map(_ => s"the w${rnd.nextInt(400)} of and to a").mkString(" ")
    val dim = 16
    // planted star in embedding space: hub H with spokes B and C at
    // cos(H,B)=cos(H,C)=cos θ ≈ 0.96 but cos(B,C)=cos 2θ ≈ 0.84 — a pair
    // graph (B,H),(C,H) where B and C are NOT near-dups of each other.
    // Exact cosines (the in-join verify is exact), so the geometry is
    // deterministic. Hub gets the LARGEST id: the pairwise policy drops
    // only id_b=H and keeps both spokes; the cluster policy keeps the
    // component min (B) and drops C and H.
    val theta = math.acos(0.96)
    def onPlane(angle: Double): Seq[Float] = {
      val v = new Array[Float](dim)
      v(0) = math.cos(angle).toFloat; v(1) = math.sin(angle).toFloat
      v.toSeq
    }
    val others = (0L until 20L).map(i => (i, sentence(12), {
      val r = new scala.util.Random(300 + i.toInt)
      Seq.fill(dim)(r.nextGaussian().toFloat)
    }))
    val star = Seq(
      (50L, sentence(12), onPlane(-theta)),   // spoke B (component min)
      (51L, sentence(12), onPlane(theta)),    // spoke C
      (99L, sentence(12), onPlane(0.0)))      // hub H, largest id
    val input = Files.createTempDirectory("graft-cp-star").toString
    (others ++ star).toDF("doc_id", "text", "embedding")
      .write.mode("overwrite").parquet(input)

    def run2(out: String, idx: String, cluster: Boolean) =
      CorpusPipeline.run(spark, input, out, idx,
        numShards = 2, partitionMultiples = 2, qualityMin = 0.3,
        nearDupThreshold = 0.9, bpeMerges = 60, bpeMaxWords = 2000,
        nearDupMethod = "embedding", clusterDrop = cluster)

    val stP = run2(Files.createTempDirectory("graft-cp-star-p").toString,
      "star_p", cluster = false)
    assert(stP.afterNearDup === 22L, s"pairwise should drop only the hub: $stP")
    val outC = Files.createTempDirectory("graft-cp-star-c").toString
    val stC = run2(outC, "star_c", cluster = true)
    assert(stC.afterNearDup === 21L, s"cluster should keep one of three: $stC")
    val ids = spark.read.parquet(s"$outC/star_c/data")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.contains(50L) && !ids.contains(51L) && !ids.contains(99L),
      s"component-min representative law violated: $ids")
  }

  test("annIndexDir: cross-run dedup via the standing index; first run identical to in-run path") {
    val rnd = new scala.util.Random(67)
    def sentence(n: Int) =
      (0 until n).map(_ => s"the w${rnd.nextInt(400)} of and to a").mkString(" ")
    val dim = 16
    def vec(seed: Int): Seq[Float] = {
      val r = new scala.util.Random(seed)
      Seq.fill(dim)(r.nextGaussian().toFloat)
    }
    def jitter(v: Seq[Float], eps: Double, seed: Int): Seq[Float] = {
      val r = new scala.util.Random(seed)
      v.map(x => (x + eps * r.nextGaussian()).toFloat)
    }
    // run 1: 40 distinct docs + 3 in-run paraphrase pairs (ids 700.. drop)
    val base = (0L until 40L).map(i => (i, sentence(12), vec(i.toInt)))
    val inRunDups = (0L until 3L).map(i =>
      (i + 700L, sentence(12), jitter(vec(i.toInt), 0.01, 900 + i.toInt)))
    val in1 = Files.createTempDirectory("graft-cpann-in1").toString
    (base ++ inRunDups).toDF("doc_id", "text", "embedding")
      .write.mode("overwrite").parquet(in1)
    val annDir = Files.createTempDirectory("graft-cpann-idx").toString + "/idx"
    def run(input: String, out: String, name: String, ann: Option[String]) =
      CorpusPipeline.run(spark, input, out, name,
        numShards = 2, partitionMultiples = 2, qualityMin = 0.3,
        nearDupThreshold = 0.95, bpeMerges = 60, bpeMaxWords = 2000,
        nearDupMethod = "embedding", annIndexDir = ann)
    // first run: no index yet -> output must be IDENTICAL to the plain
    // in-run LSH path (same corpus, same knobs), and the index gets built
    val outPlain = Files.createTempDirectory("graft-cpann-plain").toString
    val stPlain = run(in1, outPlain, "ann_plain", None)
    val out1 = Files.createTempDirectory("graft-cpann-r1").toString
    val st1 = run(in1, out1, "ann_r1", Some(annDir))
    assert(st1.afterNearDup === stPlain.afterNearDup,
      s"first indexed run must match the in-run path: $st1 vs $stPlain")
    def bundleIds(out: String, name: String): Set[Long] =
      spark.read.parquet(s"$out/$name/data")
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(bundleIds(out1, "ann_r1") === bundleIds(outPlain, "ann_plain"),
      "first indexed run must write the same surviving docs")
    assert(st1.droppedVsIndex === -1L, "no standing index on the first run")
    // run 2: fresh ids — 10 new docs + 4 planted near-dups of run-1
    // (prior-run) docs. Without the index these all survive (nothing in
    // run 2 resembles anything else in run 2); with it, the planted 4 drop.
    val newDocs = (2000L until 2010L).map(i => (i, sentence(12), vec(i.toInt + 5000)))
    val crossRunDups = (0L until 4L).map(i =>
      (i + 2700L, sentence(12), jitter(vec(10 + i.toInt), 0.01, 990 + i.toInt)))
    val in2 = Files.createTempDirectory("graft-cpann-in2").toString
    (newDocs ++ crossRunDups).toDF("doc_id", "text", "embedding")
      .write.mode("overwrite").parquet(in2)
    val out2 = Files.createTempDirectory("graft-cpann-r2").toString
    val st2 = run(in2, out2, "ann_r2", Some(annDir))
    assert(st2.droppedVsIndex === 4L,
      s"planted near-dups of indexed prior-run docs must drop: $st2")
    assert(bundleIds(out2, "ann_r2") === (2000L until 2010L).toSet,
      "run 2 must keep exactly the genuinely-new docs")
    // the survivors of run 2 were appended: a third run replaying one of
    // run 2's docs (new id, near-identical embedding) drops it too
    val in3 = Files.createTempDirectory("graft-cpann-in3").toString
    Seq((3000L, sentence(12), jitter(vec(2005 + 5000), 0.01, 777)))
      .toDF("doc_id", "text", "embedding")
      .write.mode("overwrite").parquet(in3)
    val out3 = Files.createTempDirectory("graft-cpann-r3").toString
    val st3 = run(in3, out3, "ann_r3", Some(annDir))
    assert(st3.droppedVsIndex === 1L && st3.afterNearDup === 0L,
      s"a near-dup of a run-2 survivor must drop in run 3: $st3")
    // clean incremental ingest (the common case): a batch with ZERO
    // overlap vs the index — the drop set is runtime-empty, which AQE
    // folds away together with the anti-join; the run must complete with
    // droppedVsIndex 0, not hang on a pruned metric (the r9 review's
    // Observation-on-the-join-side hazard, pinned here)
    val inClean = Files.createTempDirectory("graft-cpann-clean").toString
    (5000L until 5006L).map(i => (i, sentence(12), vec(i.toInt + 9000)))
      .toDF("doc_id", "text", "embedding")
      .write.mode("overwrite").parquet(inClean)
    val outClean = Files.createTempDirectory("graft-cpann-cleanout").toString
    val stClean = run(inClean, outClean, "ann_clean", Some(annDir))
    assert(stClean.droppedVsIndex === 0L && stClean.afterNearDup === 6L,
      s"clean ingest must keep everything and report zero drops: $stClean")
    // re-ingesting run-1's corpus VERBATIM (same ids) drops everything:
    // the ANN query self-excludes equal ids, so indexed-id membership must
    // count as prior presence — otherwise a re-run silently appends
    // duplicate ids into the index
    val out4 = Files.createTempDirectory("graft-cpann-r4").toString
    val st4 = run(in1, out4, "ann_r4", Some(annDir))
    assert(st4.afterNearDup === 0L, s"verbatim re-ingest must fully drop: $st4")
    val nids = spark.read.parquet(s"$annDir/cells").select("nid").collect()
      .map(_.getLong(0))
    assert(nids.length === nids.distinct.length,
      "the index must never hold duplicate ids")
  }

  test("strip-spans + decontaminate stages: boilerplate stripped before dedup; contaminated doc dropped") {
    // per-doc-unique words so the ONLY cross-doc repeated window is the
    // planted boilerplate (stopword filler alone never fills a 10-window).
    // The unique word sits LAST in each segment: a shared "of and to a"
    // suffix right before the boilerplate would itself repeat across the
    // carrier docs and (correctly!) be stripped as part of the span
    def sentence(i: Long) =
      (0 until 12).map(j => s"of and to a the d${i}w$j").mkString(" ")
    val boiler = "copyright footer terms apply all rights reserved contact site admin" // 10 tokens
    val u0 = sentence(0)
    val docs =
      Seq((0L, u0),                        // base text, no boilerplate
          (1L, s"$u0 $boiler")) ++         // identical MODULO boilerplate
      (2L until 10L).map(i => (i, s"${sentence(i)} $boiler")) ++ // boiler carriers
      (10L until 30L).map(i => (i, sentence(i))) ++              // plain docs
      Seq((40L, s"${sentence(40)} alpha beta gamma delta epsilon"), // contaminated
          (41L, s"${sentence(41)} alpha beta qq41"))  // brushes the set, 0 full grams
    val input = Files.createTempDirectory("graft-cp-span-in").toString
    docs.toDF("doc_id", "text").write.mode("overwrite").parquet(input)
    val benchDir = Files.createTempDirectory("graft-cp-bench").toString
    Seq((0L, "alpha beta gamma delta epsilon"))
      .toDF("bench_id", "text").write.mode("overwrite").parquet(benchDir)

    val out = Files.createTempDirectory("graft-cp-span-out").toString
    val st = CorpusPipeline.run(spark, input, out, "corpus",
      numShards = 2, partitionMultiples = 2, qualityMin = 0.3,
      nearDupThreshold = 0.8, bpeMerges = 40, bpeMaxWords = 2000,
      // spanMinDocs=3: the U0 text docs 0 and 1 share (2 docs) stays; the
      // 9-doc boilerplate window goes
      stripSpans = true, spanK = 10, spanMinDocs = 3,
      decontamBench = Some(benchDir), decontamN = 3, decontamMinHits = 2)

    assert(st.input === 32L && st.afterQuality === 32L)
    // doc 40 shares 3 distinct 3-grams with the benchmark (>= 2); doc 41's
    // "alpha beta" prefix completes no benchmark gram -> kept
    assert(st.afterDecontam === 31L, s"decontamination: $st")
    // with the boilerplate stripped, doc 1 collapses onto doc 0 and exact
    // dedup drops it — the identical-modulo-boilerplate law
    assert(st.afterExact === 30L, s"strip-then-dedup: $st")
    assert(st.afterNearDup === 30L)

    val back = spark.read.parquet(s"$out/corpus/data")
    val ids = back.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids === ((0L until 30L).toSet - 1L) + 41L, s"survivors: $ids")
    // released text carries no boilerplate token anywhere
    assert(back.filter(col("text").contains("reserved")).count() === 0L,
      "boilerplate must be stripped from every released doc")
    // ...while the 2-doc-shared U0 text was NOT treated as boilerplate
    assert(back.filter(col("doc_id") === 0L).head().getAs[String]("text")
      .contains("d0w0"), "spanMinDocs=3 must keep 2-doc-shared text")
  }

  test("annIndexDir: an all-dropped first run defers the build; a failed bundle write leaves the index untouched") {
    val dim = 16
    def vec(seed: Int): Seq[Float] = {
      val r = new scala.util.Random(seed)
      Seq.fill(dim)(r.nextGaussian().toFloat)
    }
    val annDir = Files.createTempDirectory("graft-cpann-defer").toString + "/idx"
    def run(input: String, out: String, qualityMin: Double) =
      CorpusPipeline.run(spark, input, out, "deferred",
        numShards = 2, partitionMultiples = 2, qualityMin = qualityMin,
        nearDupThreshold = 0.95, bpeMerges = 40, bpeMaxWords = 1000,
        nearDupMethod = "embedding", annIndexDir = Some(annDir))
    // run 1: every doc fails the quality gate -> zero survivors. Before
    // the guard this crashed in buildIndex's dim probe (head() on empty);
    // now the run completes and leaves NO index behind
    val junk = (0L until 8L).map(i => (i, "zz", vec(i.toInt)))
    val in1 = Files.createTempDirectory("graft-cpann-junk").toString
    junk.toDF("doc_id", "text", "embedding").write.mode("overwrite").parquet(in1)
    val st1 = run(in1, Files.createTempDirectory("graft-cpann-o1").toString, 0.99)
    assert(st1.afterNearDup === 0L && st1.totalTokens === 0L)
    assert(!new java.io.File(annDir).exists(),
      "an all-dropped run must not create a (untrainable) index")
    // run 2: real docs -> the first NON-EMPTY run builds
    val rnd = new scala.util.Random(11)
    def sentence() =
      (0 until 12).map(_ => s"the w${rnd.nextInt(300)} of and to a").mkString(" ")
    val good = (100L until 120L).map(i => (i, sentence(), vec(i.toInt)))
    val in2 = Files.createTempDirectory("graft-cpann-good").toString
    good.toDF("doc_id", "text", "embedding").write.mode("overwrite").parquet(in2)
    val st2 = run(in2, Files.createTempDirectory("graft-cpann-o2").toString, 0.3)
    assert(st2.afterNearDup === 20L)
    assert(spark.read.parquet(s"$annDir/cells").count() === 20L,
      "the first non-empty run must build the index from its survivors")
    // run 3 against a SABOTAGED output path: the bundle write throws, and
    // because the index append is sequenced AFTER the write, the standing
    // index must be exactly as before (a crash cannot strand docs as
    // indexed-but-unemitted — the membership guard would silently drop
    // them from every retry)
    val blockedOut = Files.createTempFile("graft-cpann-file", ".txt").toString
    val in3 = Files.createTempDirectory("graft-cpann-in3").toString
    Seq((300L, sentence(), vec(9001))).toDF("doc_id", "text", "embedding")
      .write.mode("overwrite").parquet(in3)
    intercept[Exception] { run(in3, blockedOut, 0.3) }
    val nids2 = spark.read.parquet(s"$annDir/cells").select("nid").collect()
      .map(_.getLong(0)).toSet
    assert(nids2 === (100L until 120L).toSet,
      s"failed bundle write must leave the index untouched: $nids2")
  }
  test("trained quality gate: model drops heuristic-passing junk; survivors match direct scoring") {
    // two vocabularies over the SAME stopword skeleton, so every doc passes
    // the surface heuristic and only the trained classifier separates them
    val glue = Vector("the", "of", "and", "to", "a", "in", "is", "was")
    val good = Vector("cat", "river", "theory", "music", "bread",
      "garden", "window", "mountain", "letter", "engine")
    val bad = Vector("zxq", "qqv", "kpz", "wxj", "vvk",
      "jjx", "qzz", "xkv", "zzp", "kqx")
    def doc(rnd: scala.util.Random, vocab: Vector[String], n: Int) =
      (0 until n).map(_ => s"${glue(rnd.nextInt(glue.size))} " +
        s"${vocab(rnd.nextInt(vocab.size))}").mkString(" ")
    val trnd = new scala.util.Random(83)
    val model = graft.ext.QualityClassifier.train(
      (0 until 200).map(_ => doc(trnd, good, 12)).toDF("text"),
      (0 until 200).map(_ => doc(trnd, bad, 12)).toDF("text"),
      "text", dim = 1 << 14, maxIter = 30)

    val crnd = new scala.util.Random(171)
    val goodDocs = (0L until 30L).map(i => (i, "src", doc(crnd, good, 14)))
    val junkDocs = (100L until 108L).map(i => (i, "src", doc(crnd, bad, 14)))
    val input = Files.createTempDirectory("graft-cp-qm-in").toString
    (goodDocs ++ junkDocs).toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(input)

    // precondition (model law, independent of the pipeline): the planted
    // junk scores below the gate, the good docs above it
    val scored = graft.ext.QualityClassifier.score(
      (goodDocs ++ junkDocs).toDF("doc_id", "source", "text"), "text", model)
    val expectKept = scored.filter(col("quality_prob") >= 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(expectKept === (0L until 30L).toSet,
      s"classifier itself failed to separate the planted corpora: $expectKept")

    val out = Files.createTempDirectory("graft-cp-qm-out").toString
    val st = CorpusPipeline.run(spark, input, out, "corpus",
      numShards = 2, partitionMultiples = 2, qualityMin = 0.3,
      bpeMerges = 40, bpeMaxWords = 2000,
      qualityModel = Some(model), qualityProbMin = 0.5)
    // the surface heuristic passes EVERYTHING (same stopword skeleton);
    // the model gate is what removes the planted junk
    assert(st.afterQuality === 38L, s"surface gate should pass all: $st")
    assert(st.afterModelQuality === 30L, s"model gate miscounted: $st")
    assert(st.afterNearDup === 30L)
    val ids = spark.read.parquet(s"$out/corpus/data")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids === expectKept, "bundle survivors != direct model scoring")
  }

  test("CLI --mode pipeline accepts --quality-model/--quality-prob-min and composes the gate") {
    // flags parse (the allowlist admits them) and the pipeline-mode body's
    // composition — load(model path) + run(qualityModel, qualityProbMin) —
    // produces the gated bundle, mirroring Main's wiring
    val raw = Main.rawFlags(Array("--mode", "pipeline", "--input", "x",
      "--out", "y", "--index", "z",
      "--quality-model", "/tmp/m.json", "--quality-prob-min", "0.6"))
    assert(raw("quality-model") === "/tmp/m.json")
    assert(raw("quality-prob-min") === "0.6")

    val glue = Vector("the", "of", "and", "to", "a")
    def doc(rnd: scala.util.Random, vocab: Vector[String]) =
      (0 until 12).map(_ => s"${glue(rnd.nextInt(glue.size))} " +
        s"${vocab(rnd.nextInt(vocab.size))}").mkString(" ")
    val good = Vector("cat", "river", "music", "bread", "garden")
    val bad = Vector("zxq", "qqv", "kpz", "wxj", "vvk")
    val trnd = new scala.util.Random(19)
    val model = graft.ext.QualityClassifier.train(
      (0 until 150).map(_ => doc(trnd, good)).toDF("text"),
      (0 until 150).map(_ => doc(trnd, bad)).toDF("text"),
      "text", dim = 1 << 14, maxIter = 30)
    val dir = Files.createTempDirectory("graft-cp-qm-cli").toString
    val mp = s"$dir/quality_model.json"
    graft.ext.QualityClassifier.save(spark, model, mp)

    val crnd = new scala.util.Random(7)
    val input = s"$dir/in"
    ((0L until 10L).map(i => (i, doc(crnd, good))) ++
      (50L until 54L).map(i => (i, doc(crnd, bad))))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(input)
    val st = CorpusPipeline.run(spark, input, s"$dir/out", "corpus",
      numShards = 2, partitionMultiples = 2, qualityMin = 0.3,
      bpeMerges = 30, bpeMaxWords = 1000,
      qualityModel = Some(graft.ext.QualityClassifier.load(spark, mp)),
      qualityProbMin = raw("quality-prob-min").toDouble)
    assert(st.afterModelQuality === 10L, s"CLI-shaped run misgated: $st")
    val ids = spark.read.parquet(s"$dir/out/corpus/data")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids === (0L until 10L).toSet)
  }
  test("mixBudget: batch pipeline mixes the deduped corpus == direct temperatureMix; BPE sees the mix") {
    val rnd = new scala.util.Random(67)
    def sentence(n: Int) =
      (0 until n).map(_ => s"the w${rnd.nextInt(400)} of and to a").mkString(" ")
    // skewed corpus: "big" has 9x the docs of "small", all unique
    val docs = (0L until 100L).map { i =>
      (i, if (i % 10 == 0) "small" else "big", sentence(12))
    }
    val input = Files.createTempDirectory("graft-cp-mix-in").toString
    docs.toDF("doc_id", "source", "text").write.mode("overwrite").parquet(input)

    val out = Files.createTempDirectory("graft-cp-mix-out").toString
    val budget = 20000L
    val st = CorpusPipeline.run(spark, input, out, "corpus",
      numShards = 2, partitionMultiples = 2, qualityMin = 0.3,
      bpeMerges = 30, bpeMaxWords = 2000,
      mixBudget = Some(budget), mixTemperature = 0.5)
    assert(st.afterNearDup === 100L, s"dedup count polluted by mixing: $st")
    assert(st.afterMix >= 0 && st.afterMix < 100L, s"mix did not cap: $st")
    assert(st.bundle.totalDocs === st.afterMix)

    // parity: the bundle's ids == direct temperatureMix over the same
    // survivors at the same knobs (quality passes everything here, no dups)
    val direct = graft.ext.Mixing.temperatureMix(
      docs.toDF("doc_id", "source", "text"), "source", "doc_id",
      length(col("text")).cast("long"), budget, temperature = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val ids = spark.read.parquet(s"$out/corpus/data")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids === direct, "pipeline mix != direct temperatureMix")
    // rebalancing: the small source's sqrt-weighted budget (25% of total)
    // exceeds its whole mass, so ALL its docs survive while big is capped —
    // its kept share rises above the 10% natural share
    assert((0L until 100L by 10).forall(ids.contains),
      "small source lost docs despite an uncapping budget")
    val smallShare = ids.count(_ % 10 == 0).toDouble / ids.size
    assert(smallShare > 0.12, s"small source share $smallShare not rebalanced")
  }

  test("mixClusterCentroids: batch pipeline labels against the frozen artifact == direct operator") {
    val rnd = new scala.util.Random(71)
    def sentence(n: Int) =
      (0 until n).map(_ => s"the w${rnd.nextInt(400)} of and to a").mkString(" ")
    // two planted topics (axis-0 90%, axis-1 10%); one provenance source,
    // so ONLY topic labeling can rebalance this corpus
    def vec(axis: Int) = {
      val a = Array.fill(16)(rnd.nextGaussian() * 0.05f)
      a(axis) = 1f + rnd.nextGaussian().toFloat * 0.05f
      a.toSeq
    }
    val docs = (0L until 100L).map { i =>
      (i, sentence(12), vec(if (i % 10 == 0) 1 else 0))
    }
    val input = Files.createTempDirectory("graft-cp-cmix-in").toString
    docs.toDF("doc_id", "text", "embedding").write.mode("overwrite").parquet(input)
    val centDir = Files.createTempDirectory("graft-cp-cmix-cent").toString + "/c"
    graft.ext.Similarity.trainClusterCentroids(
      docs.toDF("doc_id", "text", "embedding"), "doc_id", "embedding",
      k = 2, iters = 4, path = centDir)

    val out = Files.createTempDirectory("graft-cp-cmix-out").toString
    val budget = 20000L
    val st = CorpusPipeline.run(spark, input, out, "corpus",
      numShards = 2, partitionMultiples = 2, qualityMin = 0.3,
      bpeMerges = 30, bpeMaxWords = 2000,
      mixBudget = Some(budget), mixTemperature = 0.5,
      mixClusterCentroids = Some(centDir))
    assert(st.afterMix >= 0 && st.afterMix < 100L, s"mix did not cap: $st")
    assert(st.bundle.totalDocs === st.afterMix)

    // parity: bundle ids == clusterBalancedSampleWith at the same frozen
    // centroids (quality passes everything here, no dups)
    val cents = graft.ext.Similarity.loadClusterCentroids(spark, centDir)
    val direct = graft.ext.Mixing.clusterBalancedSampleWith(
      docs.toDF("doc_id", "text", "embedding"), "doc_id", "embedding",
      length(col("text")).cast("long"), budget, cents, temperature = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val ids = spark.read.parquet(s"$out/corpus/data")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids === direct, "pipeline cluster mix != direct operator")
    // topic rebalancing visible in the kept share
    val smallShare = ids.count(_ % 10 == 0).toDouble / ids.size
    assert(smallShare > 0.12, s"small topic share $smallShare not rebalanced")
  }

  test("mixPhases: batch pipeline annealing schedule == direct phasedMix; phase column lands in the bundle") {
    val rnd = new scala.util.Random(73)
    def sentence(n: Int) =
      (0 until n).map(_ => s"the w${rnd.nextInt(400)} of and to a").mkString(" ")
    val docs = (0L until 100L).map { i =>
      (i, if (i % 10 == 0) "small" else "big", sentence(12))
    }
    val input = Files.createTempDirectory("graft-cp-pmix-in").toString
    docs.toDF("doc_id", "source", "text").write.mode("overwrite").parquet(input)

    val out = Files.createTempDirectory("graft-cp-pmix-out").toString
    val phases = Seq(graft.ext.Mixing.MixPhase("pretrain", 12000L, 0.5),
      graft.ext.Mixing.MixPhase("anneal", 5000L, 0.7))
    val st = CorpusPipeline.run(spark, input, out, "corpus",
      numShards = 2, partitionMultiples = 2, qualityMin = 0.3,
      bpeMerges = 30, bpeMaxWords = 2000, mixPhases = phases)
    assert(st.afterMix >= 0 && st.afterMix < 100L, s"phased mix did not cap: $st")
    assert(st.bundle.totalDocs === st.afterMix)

    // parity: bundle (id, phase) == direct phasedMix over the same corpus
    // (quality passes everything here, no dups)
    val direct = graft.ext.Mixing.phasedMix(
      docs.toDF("doc_id", "source", "text"), "source", "doc_id",
      length(col("text")).cast("long"), phases)
      .select("doc_id", "phase").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = spark.read.parquet(s"$out/corpus/data")
      .select("doc_id", "phase").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === direct, "pipeline phased mix != direct phasedMix")
    // both phases populated, each doc in exactly one (got is a map keyed
    // by id, so size equality vs the raw row count pins uniqueness)
    assert(got.values.toSet === Set("pretrain", "anneal"))
    assert(spark.read.parquet(s"$out/corpus/data").count() === got.size)
  }

  test("mixPhases + mixClusterCentroids: annealing over frozen topic groups == direct labeled phasedMix") {
    val rnd = new scala.util.Random(79)
    def sentence(n: Int) =
      (0 until n).map(_ => s"the w${rnd.nextInt(400)} of and to a").mkString(" ")
    def vec(axis: Int) = {
      val a = Array.fill(16)(rnd.nextGaussian() * 0.05f)
      a(axis) = 1f + rnd.nextGaussian().toFloat * 0.05f
      a.toSeq
    }
    val docs = (0L until 100L).map { i =>
      (i, sentence(12), vec(if (i % 10 == 0) 1 else 0))
    }
    val input = Files.createTempDirectory("graft-cp-pcmix-in").toString
    docs.toDF("doc_id", "text", "embedding").write.mode("overwrite").parquet(input)
    val centDir = Files.createTempDirectory("graft-cp-pcmix-cent").toString + "/c"
    graft.ext.Similarity.trainClusterCentroids(
      docs.toDF("doc_id", "text", "embedding"), "doc_id", "embedding",
      k = 2, iters = 4, path = centDir)

    val out = Files.createTempDirectory("graft-cp-pcmix-out").toString
    val phases = Seq(graft.ext.Mixing.MixPhase("pretrain", 12000L, 0.5),
      graft.ext.Mixing.MixPhase("anneal", 5000L, 0.7))
    val st = CorpusPipeline.run(spark, input, out, "corpus",
      numShards = 2, partitionMultiples = 2, qualityMin = 0.3,
      bpeMerges = 30, bpeMaxWords = 2000, mixPhases = phases,
      mixClusterCentroids = Some(centDir))
    assert(st.afterMix >= 0 && st.afterMix < 100L, s"phased mix did not cap: $st")

    // parity: labeling with the same frozen artifact, then direct phasedMix
    // over cluster_id groups (quality passes everything here, no dups)
    val cents = graft.ext.Similarity.loadClusterCentroids(spark, centDir)
    val direct = graft.ext.Mixing.phasedMix(
      graft.ext.Similarity.assignClustersWith(
        docs.toDF("doc_id", "text", "embedding"), "embedding", cents),
      "cluster_id", "doc_id", length(col("text")).cast("long"), phases)
      .select("doc_id", "phase").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = spark.read.parquet(s"$out/corpus/data")
      .select("doc_id", "phase").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === direct, "pipeline phased cluster mix != direct operator")
    // cluster_id is labeling state, not corpus schema
    assert(!spark.read.parquet(s"$out/corpus/data").columns.contains("cluster_id"))
  }
}
