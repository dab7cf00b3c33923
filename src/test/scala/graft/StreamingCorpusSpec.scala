package graft

import graft.streaming.StreamingCorpus
import java.nio.file.Files
import org.apache.spark.sql.functions._

class StreamingCorpusSpec extends SparkSpec {
  import spark.implicits._

  test("incremental corpus: later batches dedup against everything already accepted") {
    val rnd = new scala.util.Random(41)
    def sentence() =
      (0 until 12).map(_ => s"the w${rnd.nextInt(300)} of and to a").mkString(" ")
    val in = Files.createTempDirectory("graft-scorpus-in").toString
    val out = Files.createTempDirectory("graft-scorpus-out").toString
    val ckpt = Files.createTempDirectory("graft-scorpus-ck").toString
    val originals = (0L until 20L).map(i => (i, sentence()))
    val schema = originals.toDF("doc_id", "text").schema

    def drain(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(in)
      val q = StreamingCorpus.start(stream, out, ckpt,
        StreamingCorpus.Config(numShards = 2, qualityMin = 0.3,
          nearDupThreshold = 0.8))
      q.awaitTermination(120000)
    }
    def accepted(): Set[Long] = spark.read
      .schema(graft.streaming.BundleStream.bundleSchema).json(s"$out/data")
      .select("_id").collect().map(_.getString(0).toLong).toSet

    // batch 1: originals + junk (quality-fails)
    (originals :+ (900L, "x")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(in)
    drain()
    assert(accepted() === (0L until 20L).toSet, s"batch1: ${accepted()}")

    // batch 2: exact clone of doc 3, near clone of doc 7, two fresh docs
    Seq((203L, originals(3)._2),
        (207L, originals(7)._2 + " zzz"),
        (300L, sentence()), (301L, sentence()))
      .toDF("doc_id", "text").write.mode("append").parquet(in)
    drain()
    assert(accepted() === ((0L until 20L).toSet + 300L + 301L),
      s"batch2 clones not dropped: ${accepted()}")

    // batch 3: a clone of a batch-2 ACCEPTED doc is also dropped
    Seq((400L, originals(5)._2), (401L, sentence()))
      .toDF("doc_id", "text").write.mode("append").parquet(in)
    drain()
    val got = accepted()
    assert(!got.contains(400L) && got.contains(401L), s"batch3: $got")

    // shard placement law holds for everything accepted
    val rows = spark.read
      .schema(graft.streaming.BundleStream.bundleSchema).json(s"$out/data")
      .select("_routing", "_shard").collect()
    assert(rows.nonEmpty && rows.forall(r =>
      graft.functions.EsMurmur3.shard(r.getString(0), 2) == r.getInt(1)))
  }

  test("semDedupCentroids: monotone stream == batch semDedup, including " +
      "drops vs earlier DROPPED rows; replay identical") {
    val rnd = new scala.util.Random(47)
    def sentence() =
      (0 until 12).map(_ => s"the w${rnd.nextInt(500)} of and to a").mkString(" ")
    val dim = 16
    def vec(i: Int): Seq[Float] = {
      val r = new scala.util.Random(2000 + i)
      Seq.fill(dim)(r.nextGaussian().toFloat)
    }
    // chain on a plane: a (angle 0) ~ x (θ) ~ y (2θ) with cos θ = 0.96 ≥
    // τ = 0.95 but cos 2θ ≈ 0.843 < τ — x drops against a, and y must
    // drop against x EVEN THOUGH x itself was dropped (the all-seen state
    // rule; survivor-only state would keep y and diverge from the batch
    // operator)
    val theta = math.acos(0.96)
    def onPlane(angle: Double): Seq[Float] = {
      val v = new Array[Float](dim)
      v(0) = math.cos(angle).toFloat; v(1) = math.sin(angle).toFloat
      v.toSeq
    }
    val in = Files.createTempDirectory("graft-ssem-in").toString
    val out = Files.createTempDirectory("graft-ssem-out").toString
    val ckpt = Files.createTempDirectory("graft-ssem-ck").toString
    val centPath = Files.createTempDirectory("graft-ssem-cent").toString
    ((0 -> onPlane(0.0).map(_.toDouble)) +:
      (1 until 4).map(c => c -> vec(300 + c).map(_.toDouble)))
      .toDF("cent_id", "centv").write.mode("overwrite").parquet(centPath)
    val b1 = (0L until 15L).map(i =>
      (i, sentence(), if (i == 5L) onPlane(0.0) else vec(i.toInt)))
    val b2 = Seq((700L, sentence(), onPlane(theta))) ++
      (15L until 19L).map(i => (i + 700L, sentence(), vec(i.toInt)))
    val b3 = Seq((800L, sentence(), onPlane(2 * theta)),
      (801L, sentence(), vec(50)))
    val schema = b1.toDF("doc_id", "text", "embedding").schema
    val cfg = StreamingCorpus.Config(numShards = 2, qualityMin = 0.3,
      nearDupThreshold = 0.95, semDedupCentroids = Some(centPath))
    def drain(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(in)
      val q = StreamingCorpus.start(stream, out, ckpt, cfg)
      q.awaitTermination(120000)
    }
    def accepted(): Set[Long] = spark.read
      .schema(graft.streaming.BundleStream.bundleSchema).json(s"$out/data")
      .select("_id").collect().map(_.getString(0).toLong).toSet
    b1.toDF("doc_id", "text", "embedding").write.mode("overwrite").parquet(in)
    drain()
    b2.toDF("doc_id", "text", "embedding").write.mode("append").parquet(in)
    drain()
    b3.toDF("doc_id", "text", "embedding").write.mode("append").parquet(in)
    drain()
    val got = accepted()
    // law: the stream's accepted set == the batch operator over the
    // concatenated corpus (texts are distinct, so the exact/minhash
    // stages pass everything through — the semantic stage is the filter)
    val all = (b1 ++ b2 ++ b3).toDF("doc_id", "text", "embedding")
    val cents = graft.ext.Similarity.loadClusterCentroids(spark, centPath)
    val expected = graft.ext.Dedup.semDedup(all, "doc_id", "embedding",
        cents, threshold = 0.95)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === expected, s"stream != batch semDedup: got $got")
    // the chain: x (700) dropped against a (5); y (800) dropped against
    // the DROPPED x — only possible because state keeps non-survivors
    assert(!got.contains(700L) && !got.contains(800L) && got.contains(5L))
    // replay: re-running the LAST batch's processing is a no-op (state
    // reads exclude the batch's own rows; bundle commits are
    // rename-if-absent)
    StreamingCorpus.processBatch(
      spark.read.parquet(in).filter(col("doc_id") >= 800L), 2L, out, cfg)
    assert(accepted() === expected, "replayed batch changed the output")
    // state compaction (offline, stream stopped): replay duplicates fold
    // away, later reads see one snapshot, and a FURTHER batch still drops
    // against the compacted history exactly as against the raw appends
    val stateRows = spark.read.parquet(s"$out/state/semdedup")
    val beforeRows = stateRows.count()
    val distinctRows = stateRows.drop("batch_id").distinct().count()
    assert(beforeRows > distinctRows,
      "the replay above should have left duplicate state rows to fold")
    val (b, a) = StreamingCorpus.compactSemDedupState(spark, out)
    assert(b === beforeRows && a === distinctRows)
    val compacted = spark.read.parquet(s"$out/state/semdedup")
    assert(compacted.count() === distinctRows)
    assert(compacted.select("batch_id").distinct().collect()
      .map(_.getLong(0)).toSeq === Seq(-1L))
    // z at angle 3θ: cos(3θ−2θ)=0.96 ≥ τ against the DROPPED y (800) —
    // the all-seen rule must keep working from the compacted snapshot
    val b4 = Seq((900L, sentence(), onPlane(3 * theta)),
      (901L, sentence(), vec(77)))
    b4.toDF("doc_id", "text", "embedding").write.mode("append").parquet(in)
    drain()
    val all2 = (b1 ++ b2 ++ b3 ++ b4).toDF("doc_id", "text", "embedding")
    val expected2 = graft.ext.Dedup.semDedup(all2, "doc_id", "embedding",
        cents, threshold = 0.95)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(accepted() === expected2,
      "post-compaction batch diverged from the batch operator")
    assert(!accepted().contains(900L), "z must drop against the dropped y")
  }

  test("annIndexDir: semantic dedup vs the standing index across batches") {
    val rnd = new scala.util.Random(73)
    def sentence() =
      (0 until 12).map(_ => s"the w${rnd.nextInt(300)} of and to a").mkString(" ")
    val dim = 16
    def vec(seed: Int): Seq[Float] = {
      val r = new scala.util.Random(seed)
      Seq.fill(dim)(r.nextGaussian().toFloat)
    }
    def jitter(v: Seq[Float], eps: Double, seed: Int): Seq[Float] = {
      val r = new scala.util.Random(seed)
      v.map(x => (x + eps * r.nextGaussian()).toFloat)
    }
    val in = Files.createTempDirectory("graft-scann-in").toString
    val out = Files.createTempDirectory("graft-scann-out").toString
    val ckpt = Files.createTempDirectory("graft-scann-ck").toString
    val annDir = Files.createTempDirectory("graft-scann-idx").toString + "/idx"
    val originals = (0L until 30L).map(i => (i, sentence(), vec(i.toInt)))
    val schema = originals.toDF("doc_id", "text", "embedding").schema

    def drain(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(in)
      val q = StreamingCorpus.start(stream, out, ckpt,
        StreamingCorpus.Config(numShards = 2, qualityMin = 0.3,
          nearDupThreshold = 0.95, annIndexDir = Some(annDir)))
      q.awaitTermination(120000)
    }
    def accepted(): Set[Long] = spark.read
      .schema(graft.streaming.BundleStream.bundleSchema).json(s"$out/data")
      .select("_id").collect().map(_.getString(0).toLong).toSet

    // batch 1 builds the index from its survivors
    originals.toDF("doc_id", "text", "embedding")
      .write.mode("overwrite").parquet(in)
    drain()
    assert(accepted() === (0L until 30L).toSet, s"batch1: ${accepted()}")
    assert(spark.read.parquet(s"$annDir/cells").count() === 30L,
      "batch-1 survivors must be indexed")

    // replay law (round-5 ADVICE): foreachBatch is at-least-once — a crash
    // after buildIndex completed but before the checkpoint commit
    // re-delivers the building batch. Without the built_by_batch marker the
    // replay sees a complete index and takes the APPEND path, re-ingesting
    // every batch-0 survivor under non-colliding b0-p* names (duplicate
    // nids). The marker routes it through the deterministic rebuild.
    val marker = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$annDir/built_by_batch")),
      java.nio.charset.StandardCharsets.UTF_8).trim
    assert(marker === "0", s"batch 0 built the index, marker says '$marker'")
    val before = spark.read.parquet(s"$annDir/cells").select("nid")
      .collect().map(_.getLong(0)).sorted.toSeq
    StreamingCorpus.processBatch(
      originals.toDF("doc_id", "text", "embedding"), 0L, out,
      StreamingCorpus.Config(numShards = 2, qualityMin = 0.3,
        nearDupThreshold = 0.95, annIndexDir = Some(annDir)))
    val after = spark.read.parquet(s"$annDir/cells").select("nid")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(after.distinct.length === after.length,
      s"replayed building batch duplicated nids: ${after.diff(after.distinct)}")
    assert(after === before,
      "a replayed building batch must rebuild the index bit-equal, not append")

    // batch 2: DIFFERENT surface text (MinHash state is blind to it) but
    // near-identical embeddings of accepted docs 4 and 9 -> the standing
    // index drops them; two genuinely new docs pass and get indexed
    Seq((500L, sentence(), jitter(vec(4), 0.01, 801)),
        (501L, sentence(), jitter(vec(9), 0.01, 802)),
        (600L, sentence(), vec(7001)), (601L, sentence(), vec(7002)))
      .toDF("doc_id", "text", "embedding").write.mode("append").parquet(in)
    drain()
    assert(accepted() === ((0L until 30L).toSet + 600L + 601L),
      s"batch2 semantic clones not dropped: ${accepted()}")
    assert(spark.read.parquet(s"$annDir/cells").count() === 32L,
      "batch-2 survivors must be appended to the index")

    // batch 3: a paraphrase of a batch-2 ACCEPTED doc is dropped too —
    // the index accumulates across batches
    Seq((700L, sentence(), jitter(vec(7001), 0.01, 803)),
        (701L, sentence(), vec(7003)))
      .toDF("doc_id", "text", "embedding").write.mode("append").parquet(in)
    drain()
    val got = accepted()
    assert(!got.contains(700L) && got.contains(701L), s"batch3: $got")
  }

  test("packMaxLen: per-batch packing with a frozen model; replay rewrites, never doubles") {
    val rnd = new scala.util.Random(47)
    def sentence() =
      (0 until 10).map(_ => s"the w${rnd.nextInt(150)} of and to a").mkString(" ")
    val out = Files.createTempDirectory("graft-scorpus-pack-out").toString

    // frozen tokenizer: trained offline (any corpus), persisted, shared by
    // every batch — the streaming contract
    val trainDocs = (0L until 40L).map(i => (i, sentence())).toDF("doc_id", "text")
    val model = graft.ext.Bpe.train(trainDocs, "text", numMerges = 30, maxWords = 2000)
    val modelPath = s"$out/frozen_bpe.json"
    graft.ext.Bpe.save(spark, model, modelPath)

    val cfg = StreamingCorpus.Config(numShards = 2, qualityMin = 0.3,
      packMaxLen = Some(48), bpeModelPath = Some(modelPath), packBuckets = 2)

    val b0 = (0L until 15L).map(i => (i, sentence())).toDF("doc_id", "text")
    StreamingCorpus.processBatch(b0, 0L, out, cfg)
    val b1 = (100L until 110L).map(i => (i, sentence())).toDF("doc_id", "text")
    StreamingCorpus.processBatch(b1, 1L, out, cfg)

    // per-batch packed dirs exist, budget holds, and coverage matches the
    // frozen model's token counts over each batch's accepted docs
    val packed = spark.read.parquet(s"$out/packed")
    assert(packed.select("batch_id").distinct().count() === 2)
    assert(packed.filter(col("n_tokens") > 48).count() === 0)
    val acceptedTok = spark.read
      .schema(graft.streaming.BundleStream.bundleSchema).json(s"$out/data")
      .select(get_json_object(col("doc"), "$.text").as("text"))
      .select(model.tokenIds(col("text")).as("ids"))
      .agg(sum(size(col("ids")))).head().getLong(0)
    val packedTok = packed.agg(sum("n_tokens")).head().getLong(0)
    assert(acceptedTok === packedTok, s"accepted $acceptedTok vs packed $packedTok")

    // replay of batch 1: at-least-once delivery rewrites batch_id=1
    // deterministically — same sequence count and token total, no doubling
    val before = packed.filter(col("batch_id") === 1)
      .agg(count(lit(1)), sum("n_tokens")).head()
    StreamingCorpus.processBatch(b1, 1L, out, cfg)
    val after = spark.read.parquet(s"$out/packed").filter(col("batch_id") === 1)
      .agg(count(lit(1)), sum("n_tokens")).head()
    assert(before === after, s"replay changed packed output: $before -> $after")

    // misconfiguration fails loud: packing without a frozen model
    val e = intercept[IllegalArgumentException] {
      StreamingCorpus.processBatch(
        Seq((999L, sentence())).toDF("doc_id", "text"), 2L, out,
        cfg.copy(bpeModelPath = None))
    }
    assert(e.getMessage.contains("bpeModelPath"))
  }

  test("packStyle=chunk: stream emits only full windows, carry threads, equals the batch operator") {
    val rnd = new scala.util.Random(91)
    def sentence() = (0 until 14).map(_ =>
      Seq("the", "of", "and", "to", "a")(rnd.nextInt(5)) +
        s" w${rnd.nextInt(100000)}").mkString(" ")
    val out = Files.createTempDirectory("graft-scorpus-chunk-out").toString
    val trainDocs = (0L until 40L).map(i => (i, sentence())).toDF("doc_id", "text")
    val model = graft.ext.Bpe.train(trainDocs, "text", numMerges = 30, maxWords = 2000)
    val modelPath = s"$out/frozen_bpe.json"
    graft.ext.Bpe.save(spark, model, modelPath)

    val cfg = StreamingCorpus.Config(numShards = 2, qualityMin = 0.3,
      packMaxLen = Some(128), bpeModelPath = Some(modelPath),
      packStyle = "chunk", packEodToken = Some(0))
    val bs = Seq((0L until 5L), (100L until 105L), (200L until 205L))
      .map(r => r.map(i => (i, sentence())).toDF("doc_id", "text"))
    bs.zipWithIndex.foreach { case (b, i) =>
      StreamingCorpus.processBatch(b, i.toLong, out, cfg)
    }

    // only exactly-full windows are ever emitted, seq_ids globally dense
    val packed = spark.read.parquet(s"$out/packed")
    assert(packed.filter(col("n_tokens") =!= 128).count() === 0,
      "chunk stream emitted a partial window")
    val ids = packed.select("seq_id").orderBy("seq_id")
      .collect().map(_.getLong(0))
    assert(ids.toSeq === (0L until ids.length), s"seq ids not dense: ${ids.toSeq}")

    // conservation: accepted tokens + one EOD per accepted doc ==
    // emitted tokens + the latest carry's pending tokens
    val accepted = spark.read
      .schema(graft.streaming.BundleStream.bundleSchema).json(s"$out/data")
      .select(get_json_object(col("doc"), "$.doc_id").cast("long").as("doc_id"),
        get_json_object(col("doc"), "$.text").as("text"))
    val acceptedStats = accepted.select(model.tokenIds(col("text")).as("ids"))
      .agg(sum(size(col("ids"))), count(lit(1))).head()
    val packedTok = packed.agg(coalesce(sum("n_tokens"), lit(0L))).head().getLong(0)
    val carrySnaps = spark.read.parquet(s"$out/state/chunkcarry")
    assert(carrySnaps.select("batch_id").distinct().count() === 3)
    val carryTok = carrySnaps.filter(col("batch_id") === 2 && col("piece_ord") >= 0)
      .agg(coalesce(sum(size(col("toks"))), lit(0L))).head().getLong(0)
    assert(acceptedStats.getLong(0) + acceptedStats.getLong(1)
      === packedTok + carryTok,
      s"tokens+eod ${acceptedStats.getLong(0) + acceptedStats.getLong(1)} " +
        s"!= emitted $packedTok + carry $carryTok")

    // the streamed emission IS the batch operator over the accepted corpus
    // (batch ids monotone, so arrival order == id order)
    val withIds = accepted.select(col("doc_id"),
      model.tokenIds(col("text")).as("ids"))
    val whole = graft.ext.Packing.chunkSequences(withIds, "doc_id", "ids",
        maxLen = 128, eodToken = Some(0))
      .filter(col("n_tokens") === 128)
      .select(col("seq_id"), hash(col("input_ids")).as("h"))
      .orderBy("seq_id").collect().toSeq
    val streamed = packed.select(col("seq_id"), hash(col("input_ids")).as("h"))
      .orderBy("seq_id").collect().toSeq
    assert(streamed === whole, "streamed windows != batch operator")

    // replay of batch 2: emitted dir + carry snapshot byte-identical
    def state() = (
      spark.read.parquet(s"$out/packed").select(col("seq_id"),
        hash(col("input_ids")).as("h")).orderBy("seq_id").collect().toSeq,
      spark.read.parquet(s"$out/state/chunkcarry")
        .filter(col("batch_id") === 2).orderBy("piece_ord")
        .select(col("piece_ord"), col("doc_id"), col("chunk_base"),
          hash(col("toks")).as("h"), col("next_seq"))
        .collect().toSeq)
    val before = state()
    StreamingCorpus.processBatch(bs(2), 2L, out, cfg)
    assert(state() === before, "replay changed chunk output or carry state")

    // misconfiguration fails loud: chunk + packCarry are exclusive
    val e = intercept[IllegalArgumentException] {
      StreamingCorpus.processBatch(bs(0), 3L, out,
        cfg.copy(packCarry = Some(1)))
    }
    assert(e.getMessage.contains("packCarry"))
  }

  test("packCarry: open bins thread through batches; replay identical; conservation holds") {
    val rnd = new scala.util.Random(53)
    // stopword + unique-word pairs: every 3-shingle contains a random word,
    // so docs clear the near-dup gate (unlike a shared filler frame, which
    // MinHash would collapse) while keeping quality's stopword mass
    def sentence() = (0 until 14).map(_ =>
      Seq("the", "of", "and", "to", "a")(rnd.nextInt(5)) +
        s" w${rnd.nextInt(100000)}").mkString(" ")
    val out = Files.createTempDirectory("graft-scorpus-carry-out").toString
    val trainDocs = (0L until 40L).map(i => (i, sentence())).toDF("doc_id", "text")
    val model = graft.ext.Bpe.train(trainDocs, "text", numMerges = 30, maxWords = 2000)
    val modelPath = s"$out/frozen_bpe.json"
    graft.ext.Bpe.save(spark, model, modelPath)

    val cfg = StreamingCorpus.Config(numShards = 2, qualityMin = 0.3,
      packMaxLen = Some(512), bpeModelPath = Some(modelPath), packBuckets = 1,
      packCarry = Some(1))

    // three small batches: per-batch pools would under-fill; with carry,
    // batch N+1 tops up batch N's leftover bins
    // 5 docs x ~82 tokens per batch: each batch part-fills a 512-token bin
    // (~100 remaining), so the next batch's docs can top it up
    val bs = Seq((0L until 5L), (100L until 105L), (200L until 205L))
      .map(r => r.map(i => (i, sentence())).toDF("doc_id", "text"))
    bs.zipWithIndex.foreach { case (b, i) =>
      StreamingCorpus.processBatch(b, i.toLong, out, cfg)
    }

    // state snapshots exist per batch (sentinel guarantees visibility even
    // when a batch leaves nothing open); latest = batch 2
    val snaps = spark.read.parquet(s"$out/state/packbins")
    assert(snaps.select("batch_id").distinct().count() === 3)

    // conservation: accepted tokens == emitted packed tokens + latest open bins
    val acceptedTok = spark.read
      .schema(graft.streaming.BundleStream.bundleSchema).json(s"$out/data")
      .select(get_json_object(col("doc"), "$.text").as("text"))
      .select(model.tokenIds(col("text")).as("ids"))
      .agg(sum(size(col("ids")))).head().getLong(0)
    val packed = spark.read.parquet(s"$out/packed")
    val packedTok =
      packed.agg(coalesce(sum("n_tokens"), lit(0L))).head().getLong(0)
    val pendingTok = snaps.filter(col("batch_id") === 2 && col("seq_id") >= 0)
      .agg(coalesce(sum(size(col("input_ids"))), lit(0L))).head().getLong(0)
    assert(acceptedTok === packedTok + pendingTok,
      s"$acceptedTok accepted vs $packedTok packed + $pendingTok pending")
    assert(packed.filter(col("n_tokens") > 512).count() === 0)

    // cross-batch sequences exist: some emitted bin holds docs from two batches
    val spansByBatch = packed.select(explode(col("doc_spans")).as("s"), col("seq_id"))
      .select(col("seq_id"), (col("s.doc_id") / 100).cast("int").as("src_batch"))
      .groupBy("seq_id").agg(countDistinct("src_batch").as("nb"))
    assert(spansByBatch.filter(col("nb") > 1).count() > 0,
      "no sequence drew from two batches — carry is not threading bins")

    // replay of batch 1 (at-least-once): emitted dir and the batch-1
    // snapshot recompute byte-identically, and batch 2 is untouched
    def fingerprint() = {
      val p = spark.read.parquet(s"$out/packed")
        .select(col("seq_id"), col("n_tokens"), hash(col("input_ids")).as("h"))
        .orderBy("seq_id").collect().toSeq
      val s = spark.read.parquet(s"$out/state/packbins")
        .filter(col("seq_id") >= 0)
        .select(col("batch_id"), col("seq_id"), hash(col("input_ids")).as("h"))
        .distinct().orderBy("batch_id", "seq_id").collect().toSeq
      (p, s)
    }
    val before = fingerprint()
    StreamingCorpus.processBatch(bs(1), 1L, out, cfg)
    assert(fingerprint() === before,
      "replaying batch 1 changed packed output or pack-bin state")
  }

  test("mixBudget: single batch == batch temperatureMix; spend accumulates; replay identical") {
    val rnd = new scala.util.Random(59)
    def sentence(words: Int) =
      (0 until words).map(_ => s"the w${rnd.nextInt(500)} of and to a").mkString(" ")
    // skewed corpus: "big" has 10x the docs of "small"; every doc unique
    // (no dedup interference with the mixing law under test)
    def mkDocs(ids: Range, nBig: Int) = ids.map { i =>
      val src = if (i % (nBig + 1) == nBig) "small" else "big"
      (i.toLong, src, sentence(10))
    }
    val out = Files.createTempDirectory("graft-scorpus-mix-out").toString
    val cfg = StreamingCorpus.Config(numShards = 2, qualityMin = 0.3,
      mixBudget = Some(6000L), mixTemperature = 0.5)

    // batch 0
    val b0 = mkDocs(0 until 44, 10).toDF("doc_id", "source", "text")
    StreamingCorpus.processBatch(b0, 0L, out, cfg)
    def accepted(): Map[Long, String] = spark.read
      .schema(graft.streaming.BundleStream.bundleSchema).json(s"$out/data")
      .select("_id", "_routing").collect()
      .map(r => r.getString(0).toLong -> r.getString(0)).toMap
    val acceptedB0 = accepted().keySet

    // law 1: a single-batch stream is EXACTLY the batch operator — same
    // quality gate, then temperatureMix at the same knobs (cost = length)
    val batchEq = graft.ext.Mixing.temperatureMix(
      b0.filter(graft.ext.TextAnalysis.qualityScoreRaw(col("text")) >= 0.3),
      "source", "doc_id", length(col("text")), 6000L, temperature = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(acceptedB0 === batchEq,
      s"single-batch stream diverged from batch operator: " +
        s"${(acceptedB0 -- batchEq, batchEq -- acceptedB0)}")

    // law 2: spend persists — batch 1 continues against remaining budget,
    // and per-source accepted cost never exceeds the final-mass budgets
    val b1 = mkDocs(1000 until 1044, 10).toDF("doc_id", "source", "text")
    StreamingCorpus.processBatch(b1, 1L, out, cfg)
    val mixState = spark.read.parquet(s"$out/state/mix")
      .select("source", "mass", "spent", "batch_id").distinct()
    val spent = mixState.groupBy("source").agg(sum("spent").as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val mass = mixState.groupBy("source").agg(sum("mass").as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val budgets = graft.ext.Mixing.temperatureBudgets(
      mass.toSeq.sortBy(_._1), 6000L, 0.5).toMap
    budgets.foreach { case (src, b) =>
      assert(spent.getOrElse(src, 0L) <= b,
        s"$src spent ${spent.get(src)} over budget $b")
    }

    // law 3: replay of batch 1 is byte-identical — same accepted set, no
    // double-spend in state (rows dedup on read)
    val before = accepted().keySet
    StreamingCorpus.processBatch(b1, 1L, out, cfg)
    assert(accepted().keySet === before, "replay changed the accepted set")
    val spentReplay = spark.read.parquet(s"$out/state/mix")
      .select("source", "mass", "spent", "batch_id").distinct()
      .groupBy("source").agg(sum("spent").as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(spentReplay === spent, s"replay double-spent: $spent -> $spentReplay")
  }

  test("mixClusterCentroids: single batch == batch operator with the frozen centroids; cluster-keyed spend accumulates; replay identical") {
    val rnd = new scala.util.Random(67)
    def sentence(words: Int) =
      (0 until words).map(_ => s"the w${rnd.nextInt(500)} of and to a").mkString(" ")
    // two planted topics in 16-dim: axis-0-heavy (90%) vs axis-1-heavy
    // (10%) — what provenance mixing can't see (every doc has source=web)
    def vec(axis: Int) = {
      val a = Array.fill(16)(rnd.nextGaussian() * 0.05f)
      a(axis) = 1f + rnd.nextGaussian().toFloat * 0.05f
      a.toSeq
    }
    def mkDocs(ids: Range) = ids.map { i =>
      (i.toLong, sentence(10), vec(if (i % 10 == 0) 1 else 0))
    }
    val out = Files.createTempDirectory("graft-scorpus-cmix-out").toString
    val centDir = Files.createTempDirectory("graft-scorpus-cents").toString + "/c"

    // frozen artifact: trained ONCE, up front (the train-centroids CLI
    // step) — every batch labels against it
    val b0 = mkDocs(0 until 50).toDF("doc_id", "text", "embedding")
    graft.ext.Similarity.trainClusterCentroids(
      b0, "doc_id", "embedding", k = 2, iters = 4, path = centDir)
    val cents = graft.ext.Similarity.loadClusterCentroids(spark, centDir)

    val cfg = StreamingCorpus.Config(numShards = 2, qualityMin = 0.3,
      mixBudget = Some(5000L), mixTemperature = 0.5,
      mixClusterCentroids = Some(centDir))
    StreamingCorpus.processBatch(b0, 0L, out, cfg)
    def accepted(): Set[Long] = spark.read
      .schema(graft.streaming.BundleStream.bundleSchema).json(s"$out/data")
      .select("_id").collect().map(_.getString(0).toLong).toSet
    val acceptedB0 = accepted()

    // law 1: a single-batch stream IS the batch operator at the same
    // frozen centroids (quality gate, then clusterBalancedSampleWith)
    val batchEq = graft.ext.Mixing.clusterBalancedSampleWith(
      b0.filter(graft.ext.TextAnalysis.qualityScoreRaw(col("text")) >= 0.3),
      "doc_id", "embedding", length(col("text")), 5000L, cents,
      temperature = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(acceptedB0 === batchEq,
      s"single-batch stream diverged from batch operator: " +
        s"${(acceptedB0 -- batchEq, batchEq -- acceptedB0)}")
    // and the small topic is genuinely rebalanced: its docs (i % 10 == 0)
    // exceed their natural 10% share under sqrt weighting
    val smallKept = acceptedB0.count(_ % 10 == 0).toDouble
    assert(smallKept / acceptedB0.size > 0.15,
      s"small topic not rebalanced: $smallKept/${acceptedB0.size}")

    // law 2: the state is keyed by CLUSTER id — per-cluster accepted cost
    // never exceeds the accumulated-mass temperature budget
    val b1 = mkDocs(1000 until 1050).toDF("doc_id", "text", "embedding")
    StreamingCorpus.processBatch(b1, 1L, out, cfg)
    val mixState = spark.read.parquet(s"$out/state/mix")
      .select("source", "mass", "spent", "batch_id").distinct()
    val keys = mixState.select("source").distinct()
      .collect().map(_.getString(0)).toSet
    assert(keys.subsetOf(Set("0", "1")),
      s"mix state not keyed by cluster ids: $keys")
    val spent = mixState.groupBy("source").agg(sum("spent").as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val mass = mixState.groupBy("source").agg(sum("mass").as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val budgets = graft.ext.Mixing.temperatureBudgets(
      mass.toSeq.sortBy(_._1), 5000L, 0.5).toMap
    budgets.foreach { case (cl, b) =>
      assert(spent.getOrElse(cl, 0L) <= b,
        s"cluster $cl spent ${spent.get(cl)} over budget $b")
    }

    // law 3: replay of batch 1 is byte-identical (frozen centroids keep
    // labels stable; state rows dedup on read — no double-spend)
    val before = accepted()
    StreamingCorpus.processBatch(b1, 1L, out, cfg)
    assert(accepted() === before, "replay changed the accepted set")
    val spentReplay = spark.read.parquet(s"$out/state/mix")
      .select("source", "mass", "spent", "batch_id").distinct()
      .groupBy("source").agg(sum("spent").as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(spentReplay === spent, s"replay double-spent: $spent -> $spentReplay")
  }

  test("mixPhases: single batch == batch phasedMix; monotone single-group stream switches phase mid-stream == batch operator; replay; disjoint") {
    import graft.ext.Mixing
    val rnd = new scala.util.Random(71)
    def sentence(words: Int) =
      (0 until words).map(_ => s"the w${rnd.nextInt(500)} of and to a").mkString(" ")
    // sized against the ~6.3k-char batches below: pretrain swallows all of
    // batch 0 and crosses its budget boundary INSIDE batch 1, anneal takes
    // the next slice — the mid-stream switch law needs both in batch 1
    val phases = Seq(Mixing.MixPhase("pretrain", 8000L, 0.5),
      Mixing.MixPhase("anneal", 2500L, 0.7))
    def acceptedPhases(out: String): Map[Long, String] = spark.read
      .schema(graft.streaming.BundleStream.bundleSchema).json(s"$out/data")
      .select(col("_id"), get_json_object(col("doc"), "$.phase").as("ph"))
      .collect().map(r => r.getString(0).toLong -> r.getString(1)).toMap
    def batchOp(docs: org.apache.spark.sql.DataFrame): Map[Long, String] =
      Mixing.phasedMix(
        docs.filter(graft.ext.TextAnalysis.qualityScoreRaw(col("text")) >= 0.3),
        "source", "doc_id", length(col("text")).cast("long"), phases)
        .select("doc_id", "phase").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap

    // law 1: a single-batch TWO-source stream is EXACTLY Mixing.phasedMix —
    // per-source floor(sqrt) budget re-derivation included
    locally {
      val out = Files.createTempDirectory("graft-scorpus-pmix1-out").toString
      val cfg = StreamingCorpus.Config(numShards = 2, qualityMin = 0.3,
        mixPhases = phases)
      val b0 = (0 until 44).map { i =>
        val src = if (i % 11 == 10) "small" else "big"
        (i.toLong, src, sentence(10))
      }.toDF("doc_id", "source", "text")
      StreamingCorpus.processBatch(b0, 0L, out, cfg)
      val got = acceptedPhases(out)
      val want = batchOp(b0)
      assert(got === want,
        s"single-batch stream diverged from phasedMix: " +
          s"extra=${got.toSet -- want.toSet} missing=${want.toSet -- got.toSet}")
    }

    // laws 2-4: a SINGLE-group monotone-id stream (group shares constant,
    // so per-batch re-derived budgets equal the final ones) — the emitted
    // (doc, phase) set across batches must equal the batch operator over
    // the CONCATENATED corpus, with the pretrain->anneal switch landing
    // mid-batch-1; replay of batch 1 changes nothing; phases disjoint.
    val out = Files.createTempDirectory("graft-scorpus-pmix2-out").toString
    val cfg = StreamingCorpus.Config(numShards = 2, qualityMin = 0.3,
      mixPhases = phases)
    def mkMono(ids: Range) =
      ids.map(i => (i.toLong, "web", sentence(10))).toDF("doc_id", "source", "text")
    val b0 = mkMono(0 until 30)
    val b1 = mkMono(1000 until 1030)
    StreamingCorpus.processBatch(b0, 0L, out, cfg)
    StreamingCorpus.processBatch(b1, 1L, out, cfg)
    val got = acceptedPhases(out)
    val want = batchOp(b0.unionByName(b1))
    assert(got === want,
      s"multi-batch stream diverged from phasedMix over the concatenation: " +
        s"extra=${got.toSet -- want.toSet} missing=${want.toSet -- got.toSet}")
    // the schedule really switched mid-stream: batch 1 contributed docs to
    // BOTH phases (budget boundary crossed inside the batch)
    val b1Phases = got.collect { case (id, ph) if id >= 1000 => ph }.toSet
    assert(b1Phases === Set("pretrain", "anneal"),
      s"expected the phase switch inside batch 1, got phases $b1Phases")

    // law 3: replay of batch 1 — same accepted set, no double-spend
    StreamingCorpus.processBatch(b1, 1L, out, cfg)
    assert(acceptedPhases(out) === got, "replay changed the accepted set")
    val spent = spark.read.parquet(s"$out/state/phasedmix_spent")
      .select("phase", "source", "spent", "batch_id").distinct()
      .groupBy("phase", "source").agg(sum("spent").as("s"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    phases.foreach { ph =>
      assert(spent.getOrElse((ph.name, "web"), 0L) <= ph.budget,
        s"${ph.name} spent ${spent.get((ph.name, "web"))} over ${ph.budget}")
    }
    // law 4: a doc appears in at most one phase, ever (one emitted row per
    // id across every batch's files)
    val rows = spark.read
      .schema(graft.streaming.BundleStream.bundleSchema).json(s"$out/data")
    assert(rows.count() === rows.select("_id").distinct().count(),
      "a document was emitted more than once across phases/batches")
  }

  test("strip-spans + decontaminate: span counts accumulate across batches; eval collisions dropped") {
    // unique word LAST per segment (see CorpusPipelineSpec): the only
    // cross-doc repeated window is the planted boilerplate
    def sentence(i: Long) =
      (0 until 12).map(j => s"of and to a the d${i}w$j").mkString(" ")
    val boiler = "copyright footer terms apply all rights reserved contact site admin"
    val out = Files.createTempDirectory("graft-sspan-out").toString
    val benchDir = Files.createTempDirectory("graft-sspan-bench").toString
    Seq((0L, "alpha beta gamma delta epsilon"))
      .toDF("bench_id", "text").write.mode("overwrite").parquet(benchDir)
    val cfg = StreamingCorpus.Config(numShards = 2, qualityMin = 0.3,
      nearDupThreshold = 0.95,
      stripSpans = true, spanK = 10, spanMinDocs = 3,
      decontamBench = Some(benchDir), decontamN = 3, decontamMinHits = 2)
    def emitted() = spark.read
      .schema(graft.streaming.BundleStream.bundleSchema).json(s"$out/data")
      .select("_id", "doc").collect()
      .map(r => r.getString(0).toLong -> r.getString(1)).toMap

    // batch 0: one boilerplate carrier (df=1 < 3 -> kept verbatim), one
    // plain doc, one benchmark-contaminated doc (dropped map-only)
    StreamingCorpus.processBatch(
      Seq((0L, sentence(0)),
          (1L, s"${sentence(1)} $boiler"),
          (5L, s"${sentence(5)} alpha beta gamma delta epsilon"))
        .toDF("doc_id", "text"), 0L, out, cfg)
    val e0 = emitted()
    assert(e0.keySet === Set(0L, 1L), s"batch0: ${e0.keySet}")
    assert(e0(1L).contains("reserved"),
      "below spanMinDocs the boilerplate must be released verbatim")

    // REPLAY batch 0 (foreachBatch is at-least-once): the span state gets
    // a second identical batch-tagged append, which the read-side distinct
    // must collapse — a double-counted df would wrongly push the next
    // carrier over spanMinDocs. Emissions must not duplicate either.
    StreamingCorpus.processBatch(
      Seq((0L, sentence(0)),
          (1L, s"${sentence(1)} $boiler"),
          (5L, s"${sentence(5)} alpha beta gamma delta epsilon"))
        .toDF("doc_id", "text"), 0L, out, cfg)
    assert(emitted().keySet === Set(0L, 1L), "replay must not re-emit")

    // batch 1: ONE more carrier -> TRUE cumulative df = 2 < 3 -> verbatim
    // (a replay-double-counted state would see 3 and strip — the law)
    StreamingCorpus.processBatch(
      Seq((20L, s"${sentence(20)} $boiler")).toDF("doc_id", "text"),
      1L, out, cfg)
    val eR = emitted()
    assert(eR.keySet === Set(0L, 1L, 20L), s"batch1: ${eR.keySet}")
    assert(eR(20L).contains("reserved"),
      "replayed state must not double-count dfs (df=2 < spanMinDocs=3)")

    // batch 2: two more carriers -> cumulative df = 4 >= spanMinDocs ->
    // stripped from THIS batch (docs 1 and 20 stay released: prefix-blind).
    // Doc 12 = doc 11's text + boilerplate: after the strip they collapse
    // and in-batch exact dedup keeps the lower id only.
    StreamingCorpus.processBatch(
      Seq((10L, s"${sentence(10)} $boiler"),
          (11L, sentence(11)),
          (12L, s"${sentence(11)} $boiler"))
        .toDF("doc_id", "text"), 2L, out, cfg)
    val e1 = emitted()
    assert(e1.keySet === Set(0L, 1L, 10L, 11L, 20L), s"batch2: ${e1.keySet}")
    assert(!e1(10L).contains("reserved"),
      "at df >= spanMinDocs the boilerplate must be stripped")
    assert(e1(1L).contains("reserved"), "already-released docs stay verbatim")
  }

  test("annIndexDir: an all-filtered first batch defers the build to the first non-empty batch") {
    val rnd = new scala.util.Random(91)
    def sentence() =
      (0 until 12).map(_ => s"the w${rnd.nextInt(300)} of and to a").mkString(" ")
    val dim = 16
    def vec(seed: Int): Seq[Float] = {
      val r = new scala.util.Random(seed)
      Seq.fill(dim)(r.nextGaussian().toFloat)
    }
    val in = Files.createTempDirectory("graft-scann2-in").toString
    val out = Files.createTempDirectory("graft-scann2-out").toString
    val ckpt = Files.createTempDirectory("graft-scann2-ck").toString
    val annDir = Files.createTempDirectory("graft-scann2-idx").toString + "/idx"
    val schema = Seq((0L, "t", Seq(0f))).toDF("doc_id", "text", "embedding").schema

    def drain(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(in)
      val q = StreamingCorpus.start(stream, out, ckpt,
        StreamingCorpus.Config(numShards = 2, qualityMin = 0.5,
          nearDupThreshold = 0.95, annIndexDir = Some(annDir)))
      q.awaitTermination(120000)
    }
    // batch 1: every doc fails the quality gate. Before the guard this
    // crashed in buildIndex's dim probe (head() on an empty frame) and
    // failed the stream commit; now the batch commits and defers the build
    (0L until 6L).map(i => (i, "zz", vec(i.toInt)))
      .toDF("doc_id", "text", "embedding").write.mode("overwrite").parquet(in)
    drain()
    assert(!new java.io.File(annDir).exists(),
      "an all-filtered batch must not create an (untrainable) index")
    // batch 2: quality docs arrive -> first non-empty batch builds
    (100L until 110L).map(i => (i, sentence(), vec(i.toInt)))
      .toDF("doc_id", "text", "embedding").write.mode("append").parquet(in)
    drain()
    assert(spark.read.parquet(s"$annDir/cells").count() === 10L,
      "the first non-empty batch must build the index from its survivors")
  }
  test("qualityModelPath: frozen model gates every batch; single batch == direct scoring") {
    // same-skeleton good/junk vocabularies: the surface heuristic passes
    // both, only the trained model separates (see CorpusPipelineSpec twin)
    val glue = Vector("the", "of", "and", "to", "a")
    val good = Vector("cat", "river", "music", "bread", "garden")
    val bad = Vector("zxq", "qqv", "kpz", "wxj", "vvk")
    def mkDoc(rnd: scala.util.Random, vocab: Vector[String]) =
      (0 until 12).map(_ => s"${glue(rnd.nextInt(glue.size))} " +
        s"${vocab(rnd.nextInt(vocab.size))}").mkString(" ")
    val trnd = new scala.util.Random(131)
    val model = graft.ext.QualityClassifier.train(
      (0 until 150).map(_ => mkDoc(trnd, good)).toDF("text"),
      (0 until 150).map(_ => mkDoc(trnd, bad)).toDF("text"),
      "text", dim = 1 << 14, maxIter = 30)
    val out = Files.createTempDirectory("graft-scorpus-qm").toString
    val mp = s"$out/quality_model.json"
    graft.ext.QualityClassifier.save(spark, model, mp)
    val cfg = StreamingCorpus.Config(numShards = 2, qualityMin = 0.3,
      qualityModelPath = Some(mp), qualityProbMin = 0.5)

    val crnd = new scala.util.Random(37)
    val b0 = ((0L until 12L).map(i => (i, mkDoc(crnd, good))) ++
      (100L until 105L).map(i => (i, mkDoc(crnd, bad)))).toDF("doc_id", "text")
    StreamingCorpus.processBatch(b0, 0L, out, cfg)
    def accepted(): Set[Long] = spark.read
      .schema(graft.streaming.BundleStream.bundleSchema).json(s"$out/data")
      .select("_id").collect().map(_.getString(0).toLong).toSet

    // law 1: one streamed batch == heuristic gate + frozen-model gate,
    // computed directly against the SAME persisted model
    val loaded = graft.ext.QualityClassifier.load(spark, mp)
    val direct = graft.ext.QualityClassifier.score(
      b0.filter(graft.ext.TextAnalysis.qualityScoreRaw(col("text")) >= 0.3),
      "text", loaded)
      .filter(col("quality_prob") >= 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(direct === (0L until 12L).toSet,
      s"model failed to separate the planted corpora: $direct")
    assert(accepted() === direct, "streamed batch != direct frozen-model gate")

    // law 2: the model stays frozen across batches — an all-junk batch 1
    // admits nothing (same boundary, no retraining drift)
    val b1 = (200L until 206L).map(i => (i, mkDoc(crnd, bad))).toDF("doc_id", "text")
    StreamingCorpus.processBatch(b1, 1L, out, cfg)
    assert(accepted() === direct, "frozen model admitted junk in a later batch")
  }
}
