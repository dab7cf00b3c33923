package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Sequence packing for LLM pretraining: assign variable-length tokenized
 * documents to fixed-capacity training sequences (context windows) so that
 * no sequence exceeds `maxLen` tokens and padding waste stays low. This is
 * the terminal operator of a pretraining data pipeline — after cleaning,
 * dedup, and tokenization, the corpus has to become fixed-shape rows the
 * trainer can batch.
 *
 * Distributed design (the 100 TB shape): optimal bin packing is NP-hard and
 * any globally-greedy pass is inherently serial, but packing QUALITY only
 * needs a large-enough pool to draw complements from, not global scope. So
 * packing runs independently inside deterministic HASH BUCKETS — bucket =
 * xxhash64(doc id) % numBuckets, a pure function of the data, NOT of the
 * partitioning — and each bucket packs its own documents with best-fit-
 * decreasing. Consequences:
 *  - the assignment is repartition-invariant and replay-stable (same corpus
 *    => byte-identical packing on any cluster layout, pinned in PackingSpec);
 *  - the shuffled payload for the assignment pass is (id, ntok) pairs —
 *    ~16 bytes per document regardless of document size; token arrays move
 *    only in [[packSequences]], exactly once, partitioned by output row;
 *  - each bucket's pool must fit one task: size `numBuckets` so that
 *    |corpus| / numBuckets stays around 10^5 docs (a few MB of (id, ntok)
 *    pairs). Waste decays with pool size long before that bound: BFD's
 *    worst case is 11/9·OPT + 1, and real-length distributions pack to
 *    >95% fill with pools of a few thousand docs.
 *
 * Documents longer than `maxLen` split into ⌈n/maxLen⌉ chunks: every chunk
 * but the last is exactly maxLen (each fills a sequence alone), the tail
 * chunk re-enters the packing pool. `chunk_ix` preserves document order so
 * a consumer can reassemble or attention-mask across the split.
 *
 * Zero- or null-token documents are excluded (they contribute no trainable
 * tokens; the coverage law in PackingSpec is over ntok > 0 docs).
 */
object Packing {

  /** One packed chunk: `doc_id`'s tokens [tok_begin, tok_end) land in
    * sequence `seq_id` at slot `seq_pos` (0-based insertion order within
    * the sequence). `tok_end - tok_begin <= maxLen`. */
  private[graft] case class Placed(doc_id: Long, chunk_ix: Int, tok_begin: Int,
                                   tok_end: Int, seq_id: Long, seq_pos: Int)
  private[graft] case class Chunk(doc_id: Long, chunk_ix: Int, len: Int, bucket: Int)

  /** Carried open-bin metadata for [[packCarryBatch]]: a part-filled
    * sequence from an earlier micro-batch, still accepting chunks.
    * `fill_count` = number of spans already placed (the next `seq_pos`). */
  private[graft] case class BinMeta(seq_id: Long, bucket: Int, opened_batch: Long,
                                    remaining: Int, fill_count: Int)

  /** Tagged per-bucket packer output: kind 0 = a placed chunk, kind 1 = a
    * bin carried forward open, kind 2 = a bin to emit this batch. */
  private[graft] case class PackOut(kind: Int, doc_id: Long, chunk_ix: Int,
                                    tok_begin: Int, tok_end: Int, seq_id: Long,
                                    seq_pos: Int, bucket: Int, remaining: Int,
                                    opened_batch: Long)

  private[graft] val spanSqlType =
    "array<struct<doc_id:bigint,chunk_ix:int,begin:int,end:int>>"

  /**
   * Pack documents into sequences of at most `maxLen` tokens, returning the
   * ASSIGNMENT ONLY — `(doc_id, chunk_ix, tok_begin, tok_end, seq_id,
   * seq_pos)` — so callers that just need placement (sharding decisions,
   * fill accounting, curriculum ordering) never shuffle token payloads.
   *
   * `ntokCol` is the document's token count (any numeric column — e.g.
   * `size(tokens)` or a stored count). `seq_id` is globally unique and
   * deterministic: `localBin * numBuckets + bucket`.
   */
  def packAssignments(docs: DataFrame, idCol: String, ntokCol: String,
                      maxLen: Int, numBuckets: Int = 256): DataFrame = {
    require(maxLen > 0, s"maxLen must be positive, got $maxLen")
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    val spark = docs.sparkSession
    import spark.implicits._
    // slim pass: one row per CHUNK, carrying only (id, chunk_ix, len,
    // bucket). Long docs explode into ⌈n/maxLen⌉ chunks here so the packer
    // sees only lengths <= maxLen.
    val chunks = docs
      .filter(col(ntokCol).isNotNull && col(ntokCol) > 0)
      .select(col(idCol).cast("long").as("doc_id"),
        col(ntokCol).cast("int").as("ntok"),
        pmod(xxhash64(col(idCol)), lit(numBuckets)).cast("int").as("bucket"))
      .withColumn("chunk_ix",
        explode(sequence(lit(0), ((col("ntok") - 1) / maxLen).cast("int"))))
      .select(col("doc_id"), col("chunk_ix"),
        least(lit(maxLen), col("ntok") - col("chunk_ix") * maxLen)
          .cast("int").as("len"),
        col("bucket"))
      .as[Chunk]
    chunks.groupByKey(_.bucket).flatMapGroups { (bucket, it) =>
      // best-fit-decreasing: items by (len desc, id asc, chunk asc) — the
      // deterministic total order; bins keyed by (remaining, binId) in a
      // navigable set so "tightest bin that still fits, lowest id on ties"
      // is one ceiling lookup (first-fit's linear bin scan is O(n·bins) —
      // quadratic at 10^5-doc pools; BFD has the same worst-case bound)
      val items = it.toArray.sortBy(c => (-c.len, c.doc_id, c.chunk_ix))
      val byCapacity = new java.util.TreeMap[(Int, Long), Unit](
        Ordering.Tuple2[Int, Long])
      val remaining = scala.collection.mutable.LongMap.empty[Int]
      val fill = scala.collection.mutable.LongMap.empty[Int] // next seq_pos
      var nextBin = 0L
      val out = new scala.collection.mutable.ArrayBuffer[Placed](items.length)
      items.foreach { c =>
        val hit = byCapacity.ceilingKey((c.len, Long.MinValue))
        val bin = if (hit == null) { // no bin fits: open one
          val b = nextBin; nextBin += 1
          remaining(b) = maxLen; fill(b) = 0
          b
        } else { byCapacity.remove(hit); hit._2 }
        val pos = fill(bin)
        out += Placed(c.doc_id, c.chunk_ix, c.chunk_ix * maxLen,
          c.chunk_ix * maxLen + c.len,
          bin * numBuckets + bucket, pos)
        fill(bin) = pos + 1
        val rem = remaining(bin) - c.len
        remaining(bin) = rem
        if (rem > 0) byCapacity.put((rem, bin), ()) // full bins retire
      }
      out.iterator
    }.toDF()
  }

  /**
   * Streaming packing with cross-batch bin carryover. Per-batch packing
   * (the `packSequences` path) under-fills when batches are small — each
   * batch's pools stand alone, so a 10-doc batch leaves every bin mostly
   * empty. This variant threads OPEN BINS through micro-batches: batch N
   * packs its chunks into the part-filled bins batch N-1 left open before
   * opening new ones, so consecutive small batches share pools and fill
   * approaches the batch path's.
   *
   * Inputs: `carried` is the previous batch's open-bin state (schema
   * `(seq_id, bucket, opened_batch, remaining, input_ids, doc_spans)`;
   * `None` on the first batch). Returns `(emitted, stillOpen)`:
   *   - `emitted` — trainer-ready `(seq_id, input_ids, doc_spans,
   *     n_tokens)` rows FINALIZED this batch: every bin that is exactly
   *     full, plus every bin whose age (`batchId - opened_batch`) reached
   *     `carryBatches`. Each sequence is emitted in exactly one batch.
   *   - `stillOpen` — the new open-bin state to persist for batch N+1
   *     (same schema as `carried`). Bounded: at most the last
   *     `carryBatches` batches' leftover bins, each ≤ maxLen tokens.
   *
   * Emission latency is bounded by `carryBatches` (default 1: a bin gets
   * exactly one top-up batch, then ships regardless of fill);
   * `carryBatches = 0` degenerates to per-batch packing. Determinism and
   * replay: the output pair is a pure function of (batch docs, carried
   * state, batchId) — same hash-bucket scheme as [[packAssignments]], so
   * it is partitioning-invariant, and a replayed batch that re-reads the
   * PRIOR batch's state recomputes both frames byte-identically (the
   * caller's read rule: latest snapshot with `batch_id` STRICTLY BEFORE
   * the current batch — `!=` would seed a replayed batch N from batch
   * N+1's bins and corrupt/duplicate sequences; see the replay read in
   * StreamingCorpus, which implements `<` for exactly this reason).
   * `seq_id` here is `(openingBatch << 32) | (localBin*numBuckets +
   * bucket)` — globally unique across the stream without counter state
   * (a different id space from the batch path's `bin*numBuckets+bucket`).
   *
   * Cost shape per batch: the cogrouped assignment pass shuffles slim
   * `(id, chunk, len)` triples plus one meta row per open bin; token
   * payloads move once (assignment⋈docs join); carried content (bounded
   * by open-bin count × maxLen tokens) joins once into the merge.
   */
  def packCarryBatch(docs: DataFrame, idCol: String, tokensCol: String,
                     carried: Option[DataFrame], batchId: Long, maxLen: Int,
                     numBuckets: Int = 256, carryBatches: Int = 1)
      : (DataFrame, DataFrame) = {
    require(maxLen > 0, s"maxLen must be positive, got $maxLen")
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    require(carryBatches >= 0, s"carryBatches must be >= 0, got $carryBatches")
    val spark = docs.sparkSession
    import spark.implicits._
    val chunks = docs
      .filter(col(tokensCol).isNotNull && size(col(tokensCol)) > 0)
      .select(col(idCol).cast("long").as("doc_id"),
        size(col(tokensCol)).cast("int").as("ntok"),
        pmod(xxhash64(col(idCol)), lit(numBuckets)).cast("int").as("bucket"))
      .withColumn("chunk_ix",
        explode(sequence(lit(0), ((col("ntok") - 1) / maxLen).cast("int"))))
      .select(col("doc_id"), col("chunk_ix"),
        least(lit(maxLen), col("ntok") - col("chunk_ix") * maxLen)
          .cast("int").as("len"),
        col("bucket")).as[Chunk]
    val binsMeta = carried match {
      case Some(st) => st.select(col("seq_id"), col("bucket").cast("int").as("bucket"),
        col("opened_batch"), col("remaining").cast("int").as("remaining"),
        size(col("doc_spans")).as("fill_count")).as[BinMeta]
      case None => spark.emptyDataset[BinMeta]
    }
    val out = chunks.groupByKey(_.bucket).cogroup(binsMeta.groupByKey(_.bucket)) {
      (bucket, itemsIt, binsIt) =>
        // BFD exactly as packAssignments, but the capacity set is SEEDED
        // with the carried bins, all maps key on the global seq_id, and
        // every open bin leaves with an emit/carry decision row.
        val items = itemsIt.toArray.sortBy(c => (-c.len, c.doc_id, c.chunk_ix))
        val byCapacity = new java.util.TreeMap[(Int, Long), Unit](
          Ordering.Tuple2[Int, Long])
        val remaining = scala.collection.mutable.LongMap.empty[Int]
        val fill = scala.collection.mutable.LongMap.empty[Int]
        val opened = scala.collection.mutable.LongMap.empty[Long]
        binsIt.foreach { b =>
          byCapacity.put((b.remaining, b.seq_id), ())
          remaining(b.seq_id) = b.remaining
          fill(b.seq_id) = b.fill_count
          opened(b.seq_id) = b.opened_batch
        }
        var nextBin = 0L
        val out = new scala.collection.mutable.ArrayBuffer[PackOut](items.length)
        items.foreach { c =>
          val hit = byCapacity.ceilingKey((c.len, Long.MinValue))
          val sid = if (hit == null) {
            val low = nextBin * numBuckets + bucket
            // the low word must stay inside 32 bits or the batchId prefix
            // is silently corrupted => cross-batch seq_id collisions
            require(low < (1L << 32),
              s"packCarryBatch: bin counter overflow in bucket $bucket " +
                s"(batch $batchId opened > 2^32/$numBuckets bins); " +
                "raise numBuckets or split the batch")
            val s = (batchId << 32) | low
            nextBin += 1
            remaining(s) = maxLen; fill(s) = 0; opened(s) = batchId
            s
          } else { byCapacity.remove(hit); hit._2 }
          val pos = fill(sid)
          out += PackOut(0, c.doc_id, c.chunk_ix, c.chunk_ix * maxLen,
            c.chunk_ix * maxLen + c.len, sid, pos, bucket, 0, 0L)
          fill(sid) = pos + 1
          val rem = remaining(sid) - c.len
          remaining(sid) = rem
          if (rem > 0) byCapacity.put((rem, sid), ())
        }
        remaining.foreach { case (sid, rem) =>
          val kind = if (rem == 0 || batchId - opened(sid) >= carryBatches) 2 else 1
          out += PackOut(kind, 0L, 0, 0, 0, sid, 0, bucket, rem, opened(sid))
        }
        out.iterator
    }.toDF().localCheckpoint() // slim rows; reused by 3 consumers below
    val placed = out.filter(col("kind") === 0)
      .select("doc_id", "chunk_ix", "tok_begin", "tok_end", "seq_id", "seq_pos")
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
      col(tokensCol).as("_toks"))
    val newSlots = placed.join(toks, "doc_id")
      .withColumn("_chunk_toks",
        slice(col("_toks"), col("tok_begin") + 1, col("tok_end") - col("tok_begin")))
      .groupBy("seq_id")
      .agg(array_sort(collect_list(struct(
        col("seq_pos"), col("doc_id"), col("chunk_ix"), col("_chunk_toks")))).as("_slots"))
    val base = carried match {
      case Some(st) => st.select(col("seq_id"),
        col("input_ids").as("_base_ids"), col("doc_spans").as("_base_spans"))
      case None => spark.range(0).select(col("id").as("seq_id"),
        expr("cast(array() as array<int>)").as("_base_ids"),
        expr(s"cast(array() as $spanSqlType)").as("_base_spans"))
    }
    // merge carried prefixes with this batch's slots: new spans offset by
    // the carried length, untouched bins pass their content through
    val merged = newSlots.join(base, Seq("seq_id"), "full_outer")
      .withColumn("_bids", coalesce(col("_base_ids"), expr("cast(array() as array<int>)")))
      .withColumn("_bspans", coalesce(col("_base_spans"), expr(s"cast(array() as $spanSqlType)")))
      .withColumn("_s", coalesce(col("_slots"), expr(
        "cast(array() as array<struct<seq_pos:int,doc_id:bigint,chunk_ix:int,_chunk_toks:array<int>>>)")))
      .select(col("seq_id"),
        concat(col("_bids"), flatten(expr("transform(_s, x -> x._chunk_toks)"))).as("input_ids"),
        expr("""aggregate(_s,
                 named_struct('spans', _bspans, 'off', size(_bids)),
                 (acc, s) -> named_struct(
                   'spans', array_append(acc.spans, named_struct(
                     'doc_id', s.doc_id, 'chunk_ix', s.chunk_ix,
                     'begin', acc.off, 'end', acc.off + size(s._chunk_toks))),
                   'off', acc.off + size(s._chunk_toks)),
                 acc -> acc.spans)""").as("doc_spans"))
    val emitted = merged.join(out.filter(col("kind") === 2).select("seq_id"), "seq_id")
      .withColumn("n_tokens", size(col("input_ids")))
    val stillOpen = merged.join(
      out.filter(col("kind") === 1)
        .select("seq_id", "bucket", "opened_batch", "remaining"), "seq_id")
      .select("seq_id", "bucket", "opened_batch", "remaining", "input_ids", "doc_spans")
    (emitted, stillOpen)
  }

  /**
   * Loader-companion columns over a [[packSequences]] (BFD whole-doc)
   * frame: what a training loader derives from `doc_spans` per token,
   * precomputed as columns so the reader is a plain parquet scan:
   *   - `position_ids` — int per token: the token's TRUE position inside
   *     its document. A span that starts a document (chunk_ix = 0) starts
   *     at 0; the continuation chunk of a document longer than `maxLen`
   *     (chunk_ix > 0 — BFD splits such docs into maxLen-sized chunks)
   *     CONTINUES at `chunk_ix * maxLen`, so per-document positional
   *     encoding survives the split (a plain reset-at-every-span would
   *     position the middle of a long document as 0..L-1).
   *   - `doc_index`    — int per token: which `doc_spans` slot the token
   *     belongs to (the block-diagonal attention-mask key: tokens attend
   *     only within equal doc_index — a continuation chunk is its own
   *     block, since its earlier tokens live in another sequence)
   * `maxLen` must be the packing maxLen (chunk offsets derive from it).
   * Pure column transforms over the spans — map-only, no shuffle, and the
   * arrays are bounded by maxLen.
   *
   * NOT for [[chunkSequences]] output: there positions are window-relative
   * by convention — use [[withChunkLoaderColumns]], which emits plain
   * 0..L-1 positions per window.
   */
  def withLoaderColumns(packed: DataFrame, maxLen: Int): DataFrame =
    packed
      .withColumn("position_ids", expr(
        s"flatten(transform(doc_spans, s -> sequence(s.chunk_ix * $maxLen, " +
          s"s.chunk_ix * $maxLen + (s.end - s.begin) - 1)))"))
      .withColumn("doc_index", expr(
        "flatten(transform(doc_spans, (s, i) -> array_repeat(i, s.end - s.begin)))"))

  /**
   * Loader-companion columns over a [[chunkSequences]] /
   * [[chunkCarryBatch]] frame — the GPT concat-and-chunk convention:
   *   - `position_ids` — plain `0..n_tokens-1` per window (positions are
   *     window-relative, NOT per-document: a mid-document piece that
   *     continues from the previous window does not restart at 0 — its
   *     absolute document position is unrecoverable inside one window,
   *     and GPT-style training uses window positions throughout)
   *   - `doc_index`    — int per token: the `doc_spans` slot, exactly as
   *     [[withLoaderColumns]] — the attention mask resets only at TRUE
   *     document boundaries inside the window (each span in a chunk
   *     window is a distinct document's piece, so slot index == document
   *     boundary key; whether a loader masks across the leading
   *     continuation piece is its policy — the spans carry `chunk_ix` to
   *     decide)
   * Map-only, bounded by maxLen, like the BFD variant.
   */
  def withChunkLoaderColumns(packed: DataFrame): DataFrame =
    packed
      .withColumn("position_ids", expr(
        "transform(input_ids, (x, i) -> i)"))
      .withColumn("doc_index", expr(
        "flatten(transform(doc_spans, (s, i) -> array_repeat(i, s.end - s.begin)))"))

  /** Style-dispatched loader columns — the convention follows the packing
    * style by construction: "bins" (BFD whole-doc) emits true per-document
    * positions incl. split continuation offsets ([[withLoaderColumns]];
    * needs the packing `maxLen`); "chunk" (concat-and-chunk) emits plain
    * window positions ([[withChunkLoaderColumns]]). */
  def loaderColumnsFor(packStyle: String, packed: DataFrame,
                       maxLen: Int): DataFrame =
    packStyle match {
      case "chunk" => withChunkLoaderColumns(packed)
      case "bins"  => withLoaderColumns(packed, maxLen)
      case other => throw new IllegalArgumentException(
        s"unknown packStyle '$other' (bins | chunk)")
    }

  /**
   * Deterministic training-order export: assign keyed rows (packed
   * sequences, documents — anything with a unique key) to `numRanks`
   * data-parallel reader shards, with a reproducible pseudo-random read
   * order inside each shard. Adds:
   *   - `rank`       — int in [0, numRanks): the reader shard
   *   - `order_key`  — hex string; sorting a rank's rows by it IS the
   *                    epoch's shuffle order
   * Both derive from md5 over `"<seed>:<key>"` — md5 is a PORTABLE hash
   * (bit-identical on every engine, unlike Spark's xxhash64 or seeded
   * samplers), so any system recomputes the same sharding and order (the
   * q77 DuckDB oracle does; same portability argument as q67's
   * train/test split). A new `seed` is a new epoch order: re-deriving the
   * columns is one map-only pass, no shuffle of the payload until the
   * caller repartitions by `rank`.
   */
  /**
   * GPT-style concat-and-chunk packing — the OTHER standard trainer
   * export ([[packSequences]] keeps documents whole in BFD bins at the
   * cost of padding; this one wastes nothing): documents concatenate in
   * global `idCol` order into one token stream (optionally terminated by
   * `eodToken` each — the GPT convention) and the stream is cut into
   * consecutive `maxLen` windows. Every sequence except the last is
   * exactly full (fill = 1 up to the final partial window); documents
   * SPAN sequence boundaries, recorded in `doc_spans` (`chunk_ix` counts
   * a document's pieces across the stream, `begin`/`end` are positions
   * inside `input_ids`) so a loader can reset attention masks at
   * boundaries. Output schema matches [[packSequences]]:
   * `(seq_id, input_ids, doc_spans, n_tokens)` with dense `seq_id`
   * 0..S-1 in stream order.
   *
   * Distributed shape (the 100 TB form): the global offset of each
   * document is an EXACT prefix sum over id order, computed without a
   * single-task global window — order-contiguous range buckets of
   * `idCol` (the [[Mixing.bucketize]] splitter: boundaries from one
   * collected percentile sketch, so every branch buckets identically
   * and boundary quality affects task balance, never values), exclusive
   * per-bucket offsets from a numBuckets-row aggregate, in-bucket
   * running sum under `Window.partitionBy(bucket)`. The token payload
   * then moves ONCE: one row per (document, overlapped sequence) with
   * the piece already sliced — O(docs + seqs) rows, not per-token — and
   * `groupBy(seq_id)` assembles windows bounded by `maxLen` tokens.
   *
   * Deterministic and repartition-invariant: offsets depend only on
   * (id, count). `idCol` must be unique. Unlike [[packAssignments]],
   * documents with zero tokens still contribute their `eodToken` when
   * one is set (every document is terminated in the stream); with no
   * eodToken they are dropped.
   */
  def chunkSequences(docs: DataFrame, idCol: String, tokensCol: String,
                     maxLen: Int, eodToken: Option[Int] = None,
                     numBuckets: Int = 64): DataFrame =
    chunkPieces(
      batchStreamPieces(docs, idCol, tokensCol, eodToken, grp = 0),
      maxLen, numBuckets, seqOffset = 0L)

  /** The batch's contribution to a chunk stream: one piece per doc in id
    * order under group `grp`, eod appended (empty docs included) when
    * set, zero-token docs dropped otherwise. */
  private def batchStreamPieces(docs: DataFrame, idCol: String,
                                tokensCol: String, eodToken: Option[Int],
                                grp: Int): DataFrame = {
    val base0 = docs.filter(col(tokensCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"), col(tokensCol).as("_toks"))
    val base = eodToken match {
      case Some(e) => base0.withColumn("_toks",
        concat(coalesce(col("_toks"), expr("array()")), array(lit(e))))
      case None => base0.filter(size(col("_toks")) > 0)
    }
    base.select(lit(grp).as("_grp"), col("doc_id").as("_ord"),
      col("doc_id"), lit(0).as("_cbase"), col("_toks"))
  }

  /**
   * Shared chunking core over an ORDERED piece stream: rows
   * `(_grp, _ord, doc_id, _cbase, _toks)` concatenate in `(_grp, _ord)`
   * order and cut into `maxLen` windows; output `seq_id` starts at
   * `seqOffset`, and a piece that spans windows gets `chunk_ix =
   * _cbase + local window index` (so re-chunked carried pieces keep
   * their original numbering). `(_grp, _ord)` must be unique.
   */
  private def chunkPieces(pieceStream: DataFrame, maxLen: Int,
                          numBuckets: Int, seqOffset: Long): DataFrame = {
    require(maxLen > 0, s"maxLen must be positive, got $maxLen")
    // exact global prefix sum in two phases (no single-task sort), on a
    // SLIM (key, count) frame — the window sort must never carry the
    // token arrays as payload; they join back once, by key, below
    val counted = pieceStream
      .select(col("_grp"), col("_ord"), size(col("_toks")).cast("long").as("_n"))
    val bucketed = Mixing.bucketize(counted, "_grp", "_ord", numBuckets)
      .getOrElse(counted.withColumn("_gbkt", lit(0)))
    val w = org.apache.spark.sql.expressions.Window
    val offs = bucketed.groupBy("_grp", "_gbkt").agg(sum("_n").as("_tot"))
      .withColumn("_goff", coalesce(sum("_tot").over(
        w.orderBy("_grp", "_gbkt").rowsBetween(Long.MinValue, -1)), lit(0L)))
      .select(col("_grp").as("_ogrp"), col("_gbkt").as("_obkt"), col("_goff"))
    val inBkt = w.partitionBy("_grp", "_gbkt").orderBy("_ord")
      .rowsBetween(Long.MinValue, -1)
    val slimOff = bucketed.join(broadcast(offs),
        col("_grp") === col("_ogrp") && col("_gbkt") === col("_obkt"))
      .withColumn("_off", col("_goff") + coalesce(sum("_n").over(inBkt), lit(0L)))
      .select("_grp", "_ord", "_n", "_off")
    val withOff = slimOff.join(pieceStream, Seq("_grp", "_ord"))
    // one row per (piece, overlapped sequence): sliced at the source
    val pieces = withOff.filter(col("_n") > 0)
      .withColumn("_firstSeq", (col("_off") / maxLen).cast("long"))
      .withColumn("_localSeq", explode(sequence(col("_firstSeq"),
        ((col("_off") + col("_n") - 1) / maxLen).cast("long"))))
      .withColumn("_seqStart", col("_localSeq") * maxLen)
      .withColumn("_begin", greatest(col("_seqStart"), col("_off")))
      .withColumn("_endEx",
        least(col("_seqStart") + maxLen, col("_off") + col("_n")))
      .withColumn("_pieceLen", (col("_endEx") - col("_begin")).cast("int"))
      .withColumn("_sliceFrom", (col("_begin") - col("_off")).cast("int"))
      .withColumn("_piece",
        slice(col("_toks"), col("_sliceFrom") + 1, col("_pieceLen")))
      .withColumn("_posInSeq", (col("_begin") - col("_seqStart")).cast("int"))
      .withColumn("chunk_ix",
        (col("_cbase") + col("_localSeq") - col("_firstSeq")).cast("int"))
    pieces.groupBy("_localSeq")
      .agg(array_sort(collect_list(struct(
        col("_posInSeq"), col("doc_id"), col("chunk_ix"), col("_piece"))))
        .as("_slots"))
      .select((col("_localSeq") + seqOffset).as("seq_id"),
        flatten(expr("transform(_slots, s -> s._piece)")).as("input_ids"),
        expr("""transform(_slots, s -> named_struct(
                 'doc_id', s.doc_id, 'chunk_ix', s.chunk_ix,
                 'begin', s._posInSeq,
                 'end', s._posInSeq + size(s._piece)))""").as("doc_spans"))
      .withColumn("n_tokens", size(col("input_ids")))
  }

  /**
   * Streaming concat-and-chunk with cross-batch window carry — the
   * [[chunkSequences]] analog of [[packCarryBatch]]: the stream's final
   * PARTIAL window (there is at most one; every other window is full by
   * construction) is not emitted but carried, its pieces re-entering the
   * next batch's stream ahead of that batch's documents. A stream of
   * arbitrarily small batches therefore emits ONLY exactly-full windows,
   * each exactly once, with globally continuous `seq_id`s — and when
   * batch ids are monotone (later batches carry larger doc ids, the
   * usual ingest shape) the emitted windows are IDENTICAL to running
   * [[chunkSequences]] over the concatenated corpus (the spec law).
   *
   * `carried` is the previous batch's carry state (`None` first batch):
   * `(piece_ord, doc_id, chunk_base, toks, next_seq)` — the partial
   * window's pieces in order, plus a `piece_ord = -1` sentinel row that
   * keeps `next_seq` (the next global window id) visible even when the
   * stream happened to end exactly on a window boundary. Returns
   * `(emitted, carriedOut)`, both lazy; `carriedOut` always contains the
   * sentinel. Carried pieces keep their original `doc_id`/`chunk_ix`
   * (`chunk_base` threads through the re-chunk), and a carried piece can
   * never split again: the carry is < maxLen tokens, so the next batch's
   * first window swallows it whole. Deterministic pure function of
   * (batch docs, carried state) — replay-safe under the same
   * read-strictly-before snapshot rule as [[packCarryBatch]].
   */
  def chunkCarryBatch(docs: DataFrame, idCol: String, tokensCol: String,
                      carried: Option[DataFrame], maxLen: Int,
                      eodToken: Option[Int] = None,
                      numBuckets: Int = 64): (DataFrame, DataFrame) = {
    require(maxLen > 0, s"maxLen must be positive, got $maxLen")
    // bounded driver read: ONE row (the sentinel carries next_seq)
    val offset: Long =
      carried.map(_.select(max("next_seq")).head().getLong(0)).getOrElse(0L)
    val carrPieces = carried.map(_.filter(col("piece_ord") >= 0)
      .select(lit(0).as("_grp"), col("piece_ord").cast("long").as("_ord"),
        col("doc_id"), col("chunk_base").as("_cbase"),
        col("toks").as("_toks")))
    val batchPieces =
      batchStreamPieces(docs, idCol, tokensCol, eodToken, grp = 1)
    val all = carrPieces.map(_.unionByName(batchPieces)).getOrElse(batchPieces)
    // materialize ONCE: three consumers read `windows` (the emitted
    // filter, the partial-window decomposition, the sentinel aggregate) —
    // without this the two token-bearing shuffles would re-run per
    // consumer; blocks are bounded by the batch and reclaimed when the
    // frames go unreachable
    val windows = chunkPieces(all, maxLen, numBuckets, offset).localCheckpoint()
    val emitted = windows.filter(col("n_tokens") === maxLen)
    // the at-most-one partial window decomposes back into carry pieces
    val partial = windows.filter(col("n_tokens") < maxLen)
    val pieces = partial
      .select(col("seq_id"), col("input_ids"),
        posexplode(col("doc_spans")).as(Seq("piece_ord", "s")))
      .select(col("piece_ord"), col("s.doc_id").as("doc_id"),
        col("s.chunk_ix").as("chunk_base"),
        expr("slice(input_ids, s.begin + 1, s.end - s.begin)").as("toks"),
        col("seq_id").as("next_seq"))
    val sentinel = windows
      .agg((lit(offset) + coalesce(sum(when(col("n_tokens") === maxLen, 1L)),
        lit(0L))).as("next_seq"))
      .select(lit(-1).as("piece_ord"), lit(-1L).as("doc_id"),
        lit(0).as("chunk_base"),
        expr("cast(array() as array<int>)").as("toks"), col("next_seq"))
    (emitted, pieces.unionByName(sentinel))
  }

  def shardSequences(rows: DataFrame, keyCol: String, numRanks: Int,
                     seed: Long = 0L): DataFrame = {
    require(numRanks > 0, s"numRanks must be positive, got $numRanks")
    val h = md5(concat_ws(":", lit(seed), col(keyCol).cast("string")))
    rows
      .withColumn("order_key", h)
      // first 8 hex chars as an unsigned int, mod ranks: uniform, and
      // independent of order_key's ORDER within a rank only in the sense
      // that rank uses a prefix of the same hash — uniformity is what
      // matters for balance (PackingSpec pins it)
      .withColumn("rank",
        (conv(substring(col("order_key"), 1, 8), 16, 10).cast("long")
          % numRanks).cast("int"))
  }

  /**
   * Materialized packing: concatenate token arrays into trainer-ready rows
   * `(seq_id, input_ids, n_tokens, doc_spans)` where `doc_spans` is
   * `array<struct<doc_id, chunk_ix, begin, end>>` over positions INSIDE
   * `input_ids` — what a loader needs to reset attention masks / position
   * ids at document boundaries. `tokensCol` is `array<int>` token ids
   * (e.g. [[BpeModel.tokenIds]] output).
   *
   * Cost shape: [[packAssignments]] on counts (16 B/doc shuffle), one join
   * of the assignment back to the corpus on the id (token arrays cross the
   * wire once, already sliced to their chunk), one groupBy(seq_id) whose
   * groups are bounded by maxLen tokens.
   */
  def packSequences(docs: DataFrame, idCol: String, tokensCol: String,
                    maxLen: Int, numBuckets: Int = 256): DataFrame = {
    val asg = packAssignments(
      docs.select(col(idCol), size(col(tokensCol)).as("_ntok")),
      idCol, "_ntok", maxLen, numBuckets)
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
      col(tokensCol).as("_toks"))
    val sliced = asg.join(toks, "doc_id")
      // slice() is 1-based; chunk token window is [tok_begin, tok_end)
      .withColumn("_chunk_toks",
        slice(col("_toks"), col("tok_begin") + 1, col("tok_end") - col("tok_begin")))
      .drop("_toks")
    sliced.groupBy("seq_id")
      .agg(array_sort(collect_list(struct(
        col("seq_pos"), col("doc_id"), col("chunk_ix"), col("_chunk_toks")))).as("_slots"))
      .select(col("seq_id"),
        flatten(expr("transform(_slots, s -> s._chunk_toks)")).as("input_ids"),
        expr("""aggregate(_slots,
                 named_struct('spans', cast(array() as array<struct<doc_id:bigint,chunk_ix:int,begin:int,end:int>>), 'off', 0),
                 (acc, s) -> named_struct(
                   'spans', array_append(acc.spans, named_struct(
                     'doc_id', s.doc_id, 'chunk_ix', s.chunk_ix,
                     'begin', acc.off, 'end', acc.off + size(s._chunk_toks))),
                   'off', acc.off + size(s._chunk_toks)),
                 acc -> acc.spans)""").as("doc_spans"))
      .withColumn("n_tokens", size(col("input_ids")))
  }
}
