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
  private val MinhashPrime = 4294967311L // first prime > 2^32
  private def perm(seed: Int): (Long, Long) = {
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
}
