package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for training-data pipelines: exact (hash groupBy),
 * MinHash+LSH (shingle -> signature -> banded bucket join), n-gram Jaccard
 * verification, SimHash. All distributed dataflow: the only shuffles are the
 * groupBys/joins on dedup keys; no driver-side collection.
 */
object Dedup {

  /** Exact dedup: one representative row per key, plus the duplicate count.
    * Representative = min(struct(orderCols)) — deterministic under ties on
    * the first orderCols. Single hash aggregate (partial+final). */
  def exact(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String]): DataFrame = {
    val rep = min(struct(orderCols.map(col): _*)).as("_rep")
    df.groupBy(keyCols.map(col): _*)
      .agg(rep, count(lit(1)).as("dup_cnt"))
      .select(keyCols.map(col) ++
        orderCols.map(c => col(s"_rep.$c").as(c)) :+ col("dup_cnt"): _*)
  }

  /** Distinct word k-shingles of the text (lowercased). k=3 default. */
  def shingles(text: Column, k: Int = 3): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    val n = size(toks)
    array_distinct(
      when(n < k, array(concat_ws(" ", toks)))
        .otherwise(transform(sequence(lit(0), n - k),
          i => concat_ws(" ", slice(toks, i + 1, lit(k))))))
  }

  /** 64-bit hashes of the distinct shingles — the base set for
    * MinHash/Jaccard. One codegen'd pass; bit-compatible with
    * [[shingleHashesHof]] (pinned by spec). */
  def shingleHashes(text: Column, k: Int = 3): Column =
    graft.functions.EsFunctions.shingle_hashes(text, k)

  /** Composable-builtins formulation of the same hashes (spec-only). */
  private[graft] def shingleHashesHof(text: Column, k: Int = 3): Column =
    transform(shingles(text, k), s => xxhash64(s))

  // universal-hash family for MinHash permutations over a 32-bit base
  // domain: h_i(x) = (a_i * x32 + b_i) mod P with P the first prime above
  // 2^32. x32 < 2^32 and a_i < 2^30 keep products below 2^62, so the
  // arithmetic never overflows a long even under ANSI mode; the mod makes
  // each h_i a genuine pseudo-permutation (without it the map is monotonic
  // and every hash would select the same global-min shingle).
  private[graft] val MinhashPrime = 4294967311L // first prime > 2^32
  private[graft] def perm(seed: Int): (Long, Long) = {
    val r = new scala.util.Random(seed * 2654435761L)
    (r.nextInt((1 << 30) - 1).toLong + 1L, r.nextInt(Int.MaxValue).toLong)
  }

  /** MinHash signature as an array<long> of `numHashes` minima — one
    * codegen'd pass (graft.functions.MinHashSig) instead of numHashes
    * interpreted HOF traversals. The HOF formulation below is kept for the
    * differential spec that pins the hash family.
    */
  def minhashSignature(hashes: Column, numHashes: Int = 32): Column =
    graft.functions.EsFunctions.minhash_sig(hashes, numHashes)

  /** Reference HOF formulation of the same family (spec-only). */
  private[graft] def minhashSignatureHof(hashes: Column, numHashes: Int): Column = {
    val h32 = transform(hashes, h => h.bitwiseAND(lit(0xFFFFFFFFL)))
    array((0 until numHashes).map { i =>
      val (a, b) = perm(i)
      array_min(transform(h32, h => (h * lit(a) + lit(b)) % lit(MinhashPrime)))
    }: _*)
  }

  /**
   * LSH candidate pairs: split the signature into `bands` bands, bucket-join
   * docs sharing any band. Returns (id_a, id_b) with id_a < id_b, distinct.
   * Cost: one explode (x bands), one shuffle on the band key, one self-join
   * within buckets — no all-pairs comparison.
   */
  def lshCandidates(df: DataFrame, idCol: String, sigCol: String,
                    sigLen: Int, bands: Int,
                    maxBucket: Int = 10000): DataFrame = {
    require(sigLen % bands == 0, s"signature length $sigLen not divisible by $bands bands")
    val r = sigLen / bands
    val banded = df.select(col(idCol),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => hash(slice(col(sigCol), b * r + 1, lit(r)), b))))
      .select(col(idCol), col("pos").as("band"), col("col").as("band_key"))
    // skew guard: a degenerate bucket of B docs yields B^2 pairs; buckets
    // past maxBucket are near-identical dup clusters — cap them (their
    // members still pair through their other, more selective bands).
    // PAYLOAD-FREE form (same pattern as Similarity's oversizedGuard):
    // bucket sizes come from a bare-key partial+final count and the
    // oversized keys — at most n·bands/maxBucket of them, driver-bounded —
    // broadcast into a left-anti hash join. Output rows identical to the
    // earlier count()-over-window formulation, which sorted the full
    // banded stream through an extra exchange before the self-join
    // shuffled it again.
    val big = banded.groupBy("band", "band_key").count()
      .filter(col("count") > maxBucket)
      .select(col("band"), col("band_key"))
    val capped = banded.join(broadcast(big), Seq("band", "band_key"), "left_anti")
    val a = capped.alias("a")
    val b = capped.alias("b")
    a.join(b, col("a.band") === col("b.band") &&
        col("a.band_key") === col("b.band_key") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
  }

  /** Exact Jaccard similarity of two distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union === 0, 0.0).otherwise(inter / union)
  }

  /**
   * Full MinHash near-dup pipeline: candidates from LSH, verified with exact
   * shingle Jaccard >= `threshold`. Output: (id_a, id_b, jaccard_sim).
   */
  def minhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      numHashes: Int = 32, bands: Int = 8, k: Int = 3,
                      threshold: Double = 0.7): DataFrame = {
    // sorted hashes: the per-pair verify is then an allocation-free merge
    val hashed = docs.select(col(idCol),
      array_sort(shingleHashes(col(textCol), k)).as("_sh"))
    val withSig = hashed.withColumn("_sig", minhashSignature(col("_sh"), numHashes))
    val cands = lshCandidates(withSig.select(col(idCol), col("_sig")), idCol, "_sig",
      numHashes, bands)
    // NOTE (round-16 optimization pass, measured): a candidate-id
    // semi-join prefilter on `slim` (guide §3.2 shape) was tried here and
    // REGRESSED the 1M A/B ~2-3x (22.2/13.9 s -> 39.2/47.3 s medians).
    // In the sparse-candidate regime AQE already broadcasts the small
    // pair table into both verify joins, so the heavy shingle arrays
    // never shuffle — the prefilter only added a third reference to the
    // LSH candidate subtree (recomputed, not stage-reused) and an extra
    // broadcast round; and in the dup-heavy regime the id set is not
    // small, so it cannot win there either. Keep the direct joins.
    val slim = hashed.select(col(idCol), col("_sh"))
    cands
      .join(slim.withColumnsRenamed(Map(idCol -> "id_a", "_sh" -> "_sh_a")), "id_a")
      .join(slim.withColumnsRenamed(Map(idCol -> "id_b", "_sh" -> "_sh_b")), "id_b")
      .withColumn("jaccard_sim",
        graft.functions.EsFunctions.jaccard_sorted(col("_sh_a"), col("_sh_b")))
      .filter(col("jaccard_sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard_sim"), 6).as("jaccard_sim"))
  }

  /** SimHash (64-bit) from token hashes — see [[graft.functions.SimHash64]]. */
  def simhash(text: Column): Column =
    graft.functions.EsFunctions.simhash64(
      transform(split(lower(trim(text)), "\\s+"), t => xxhash64(t)))

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Positional k-word window hashes (codegen; index i = window starting
    * at token i; shorter-than-k texts yield an empty array). */
  def windowHashes(text: Column, k: Int): Column =
    graft.functions.EsFunctions.window_hashes(text, k)

  /**
   * Repeated-span detection — substring-level exact dedup in its
   * distributed, suffix-array-free form (the "dedup repeated substrings
   * across the corpus" stage of LLM data pipelines): every k-word window
   * whose exact (lowercased) text occurs in at least `minDocs` distinct
   * documents. Returns (idCol, pos) — one row per repeated window
   * position; `pos` is the 0-based starting token, covering tokens
   * `[pos, pos+k-1]`.
   *
   * Scale shape: the corpus explodes to slim (id, pos, hash64) triples —
   * ~one row per token, LINEAR in corpus size, no string payload moves.
   * Document frequency per window is a distinct-(hash,id) aggregate, both
   * partial+final; the repeated-hash set joins back on the hash (AQE
   * broadcasts it when small). A boilerplate window appearing in millions
   * of docs is NOT a skew problem: the join key fans out across its
   * occurrences' partitions and the final groupBy is keyed by doc, not
   * window. Windows are matched by seed-42 XXH64 — at 2^64, corpus-level
   * collision odds are negligible (and the q73 oracle, which joins exact
   * window STRINGS, would catch one).
   */
  def repeatedSpans(docs: DataFrame, idCol: String, textCol: String,
                    k: Int = 10, minDocs: Int = 2): DataFrame = {
    val wins = docs.select(col(idCol),
        posexplode(windowHashes(col(textCol), k)).as(Seq("pos", "h")))
    val rep = wins.select(col("h"), col(idCol)).distinct()
      .groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDocs)
      .select("h")
    wins.join(rep, "h").select(col(idCol), col("pos"))
  }

  /**
   * Strip repeated spans: remove every token covered by a repeated window
   * (overlapping `[pos, pos+k-1]` ranges merged), keep the rest in order,
   * re-join with single spaces. Adds `<textCol>_clean`; docs with no
   * repeated span keep their text verbatim. One extra per-doc groupBy
   * (collect_list of positions, bounded by tokens-per-doc) + a left join
   * back to the corpus.
   */
  def stripRepeatedSpans(docs: DataFrame, idCol: String, textCol: String,
                         k: Int = 10, minDocs: Int = 2): DataFrame =
    stripSpansAt(docs, repeatedSpans(docs, idCol, textCol, k, minDocs),
      idCol, textCol, k)

  /** Strip the given `(idCol, pos)` window positions from each doc — the
    * application half of [[stripRepeatedSpans]], reusable when the
    * repeated-window set comes from elsewhere (e.g. the streaming
    * pipeline's accumulated cross-batch span state). */
  private[graft] def stripSpansAt(docs: DataFrame, spanPos: DataFrame,
                                  idCol: String, textCol: String,
                                  k: Int): DataFrame = {
    val spans = spanPos
      .groupBy(idCol).agg(sort_array(collect_list("pos")).as("_spans"))
    val strip = udf((text: String, spans: Seq[Int]) => {
      if (text == null) null
      else {
        val toks = text.trim.split("\\s+", -1)
        val drop = new Array[Boolean](toks.length)
        spans.foreach { p =>
          var i = p; val end = math.min(p + k, toks.length)
          while (i < end) { drop(i) = true; i += 1 }
        }
        toks.iterator.zipWithIndex.collect { case (t, i) if !drop(i) => t }
          .mkString(" ")
      }
    })
    docs.join(spans, Seq(idCol), "left")
      .withColumn(s"${textCol}_clean",
        when(col("_spans").isNull, col(textCol))
          .otherwise(strip(col(textCol), col("_spans"))))
      .drop("_spans")
  }

  /**
   * Connected components over a near-dup pair graph — cluster ids for
   * keep-one-per-CLUSTER dedup semantics (pairwise drop-the-greater
   * over-drops on chains A~B~C where A!~C). Input: a 2-column (id_a,
   * id_b) frame from [[minhashNearDups]], [[Similarity.cosineNearDupsLsh]]
   * or any other pair source. Output: (id, cluster_id) for every id
   * appearing in a pair, cluster_id = min id of the component.
   *
   * Hash-min label propagation: each round joins labels across edges and
   * keeps the per-node min — one slim shuffle join + one aggregate per
   * round, converging in O(component diameter) rounds. Near-dup
   * components are dense and shallow (diameter a handful), so the bound
   * is small in practice; `maxIters` caps pathological chains and the
   * iteration stops at the first round with no label change.
   * `localCheckpoint` truncates the growing lineage each round (the plan
   * would otherwise double per iteration).
   *
   * The convergence probe rides INSIDE the per-round aggregate: the old
   * label enters the union as a third column (null on propagated rows —
   * `min` ignores nulls, and every id has exactly one labels row, so
   * `min(_old)` recovers the previous label with NO join), labels only
   * decrease so changed == `lbl < _old`, the aggregated frame is what gets
   * checkpoint-materialized, and the change probe is a filter over the
   * already-materialized local blocks — one shuffle join (edges x labels)
   * + one aggregate per round, nothing else.
   *
   * Throws if `maxIters` rounds don't converge (a component with diameter
   * > maxIters would otherwise return silently WRONG cluster ids); use
   * [[nearDupClustersWithStatus]] to get partial labels plus the flag.
   */
  def nearDupClusters(pairs: DataFrame, maxIters: Int = 25): DataFrame = {
    val (labels, converged, iters) = nearDupClustersWithStatus(pairs, maxIters)
    require(converged, s"nearDupClusters did not converge after $iters rounds " +
      "— a component's diameter exceeds maxIters and its labels would be " +
      "wrong; raise maxIters (or call nearDupClustersWithStatus for " +
      "partial labels)")
    labels
  }

  /** [[nearDupClusters]] returning `(labels, converged, rounds)` instead of
    * throwing on non-convergence. */
  def nearDupClustersWithStatus(pairs: DataFrame,
                                maxIters: Int = 25): (DataFrame, Boolean, Int) = {
    val Array(ca, cb) = pairs.columns.take(2)
    val edges = pairs.select(col(ca).as("src"), col(cb).as("dst"))
      .union(pairs.select(col(cb).as("src"), col(ca).as("dst")))
      .distinct().persist()
    try {
      var labels = edges.select(col("src").as("id")).distinct()
        .withColumn("lbl", col("id"))
        .localCheckpoint(true)
      var iter = 0
      var converged = false
      while (!converged && iter < maxIters) {
        val prop = edges
          .join(labels.select(col("id").as("src"), col("lbl").as("_l")), "src")
          .select(col("dst").as("id"), col("_l").as("lbl"))
        // min-aggregate carries the previous label along so the change
        // probe needs no second join: prop rows contribute null _old
        // (ignored by min) and each id has exactly one labels row, so
        // min(_old) IS the previous label (prop ids ⊆ edge endpoints =
        // label ids)
        val lblType = labels.schema("lbl").dataType
        val next = labels.select(col("id"), col("lbl"), col("lbl").as("_old"))
          .union(prop.select(col("id"), col("lbl"),
            lit(null).cast(lblType).as("_old")))
          .groupBy("id").agg(min("lbl").as("lbl"), min("_old").as("_old"))
          .localCheckpoint(true)
        converged = next.filter(col("lbl") < col("_old")).isEmpty
        labels = next.select("id", "lbl")
        iter += 1
      }
      (labels.withColumnRenamed("lbl", "cluster_id"), converged, iter)
    } finally edges.unpersist()
  }

  /** Keep one representative per near-dup cluster: drops every doc whose
    * id appears in a pair but is not its component's min id. Docs in no
    * pair always survive. */
  /**
   * SemDeDup (Abbas et al., 2023): semantic dedup via cluster-bounded
   * cosine pruning. Embeddings are labeled against FROZEN centroids (the
   * deterministic [[Similarity.assignClustersWith]] kernel — same frozen
   * artifact discipline as streaming cluster mixing), then within each
   * cluster a row is dropped when an EARLIER row of the SAME cluster has
   * cosine ≥ `threshold` to it. "Earlier" is the `keep` policy:
   *  - `"first"` (default): smaller id wins — the deterministic greedy
   *    keep-first variant of the paper's per-group pruning.
   *  - `"low-similarity"`: the row FARTHER from its cluster centroid wins
   *    (smaller rounded `dot(unit-vec, centroid)`, ties to the smaller
   *    id) — the paper's published keep rule: among near-duplicates the
   *    least-typical example preserves the most diversity.
   * Returns the kept rows with their `cluster_id`.
   *
   * Scale shape: the quadratic candidate pairing is an equi-join ON THE
   * CLUSTER LABEL, so pair cost is Σ|cluster|², not n² — the label is the
   * LSH-like blocking key, and `nlist` is the knob that bounds it (the
   * paper runs k=50k on 5B embeddings). Only bare (id, unit-vec[, key])
   * rows enter the join; the exact cosine is computed inside the join
   * projection and thresholded immediately (the cosineNearDupsLsh shuffle
   * discipline); the centroid-similarity key is one codegen'd `cell_dot`
   * projection per row, never a join. A degenerate cluster (≫
   * corpus/nlist) should be re-split with a finer artifact — the join's
   * skew is AQE-handled but the quadratic cost is semantic.
   */
  def semDedup(docs: DataFrame, idCol: String, vecCol: String,
               cents: IndexedSeq[Seq[Double]], threshold: Double,
               roundTo: Int = 4, keep: String = "first"): DataFrame = {
    val labeled = Similarity.assignClustersWith(docs, vecCol, cents)
    val dropped = semDedupPairsFrom(labeled, idCol, vecCol, threshold,
        roundTo, cents, keep)
      .select(col("id_b").as(idCol)).distinct()
    labeled.join(dropped, Seq(idCol), "left_anti")
  }

  /** [[semDedup]]'s candidate pairs in the near-dup pair shape
    * `(id_a, id_b)` where `id_a` precedes `id_b` under the keep policy
    * (keep="first": plain `id_a < id_b`) — the form the pipeline's shared
    * drop policies (pairwise higher-id / clusterDrop components) consume,
    * so `nearDupMethod = "semantic"` plugs into
    * [[graft.pipeline.CorpusPipeline]] exactly like the minhash and LSH
    * methods. Same cluster-label blocking key, same rounded-cosine
    * threshold. */
  def semDedupPairs(docs: DataFrame, idCol: String, vecCol: String,
                    cents: IndexedSeq[Seq[Double]], threshold: Double,
                    roundTo: Int = 4, keep: String = "first"): DataFrame =
    semDedupPairsFrom(Similarity.assignClustersWith(docs, vecCol, cents),
      idCol, vecCol, threshold, roundTo, cents, keep)

  /** Pair join over an ALREADY-labeled frame — [[semDedup]] labels once
    * and shares the frame (the argmax-over-nlist labeling is the per-row
    * cost at scale; computing it twice would double the stage). */
  private def semDedupPairsFrom(labeled: DataFrame, idCol: String,
                                vecCol: String, threshold: Double,
                                roundTo: Int, cents: IndexedSeq[Seq[Double]],
                                keep: String): DataFrame = {
    val base = labeled.select(col(idCol).as("_id"), col("cluster_id").as("_cl"),
      Similarity.unitize(col(vecCol).cast("array<double>")).as("_uv"))
    // the precedence key: nothing for keep-first (id order suffices);
    // rounded centroid similarity for keep-low-similarity — the SAME
    // measure the labeling argmax used (dot of the unit vector with the
    // raw frozen centroid, sequential sum), so an oracle recomputes it
    val slim = keep match {
      case "first" => base.withColumn("_ck", lit(0.0))
      case "low-similarity" =>
        base.withColumn("_ck", round(graft.functions.PqFunctions.cell_dot(
          col("_uv"), col("_cl").cast("int"),
          cents.flatten.toArray, cents.head.length), roundTo))
      case other => throw new IllegalArgumentException(
        s"unknown semDedup keep policy '$other' (first | low-similarity)")
    }
    val a = slim.select(col("_id").as("id_a"), col("_cl"),
      col("_uv").as("_uva"), col("_ck").as("_cka"))
    val b = slim.select(col("_id").as("id_b"), col("_cl"),
      col("_uv").as("_uvb"), col("_ck").as("_ckb"))
    val precedes =
      if (keep == "first") col("id_a") < col("id_b")
      else col("_cka") < col("_ckb") ||
        (col("_cka") === col("_ckb") && col("id_a") < col("id_b"))
    a.join(b, Seq("_cl"))
      .filter(precedes &&
        round(Similarity.dot(col("_uva"), col("_uvb")), roundTo) >= threshold)
      .select("id_a", "id_b")
  }

  def dropNearDupClusters(docs: DataFrame, idCol: String,
                          pairs: DataFrame): DataFrame = {
    val nonRep = nearDupClusters(pairs)
      .filter(col("id") =!= col("cluster_id"))
      .select(col("id").as(idCol))
    docs.join(nonRep, Seq(idCol), "left_anti")
  }
}
