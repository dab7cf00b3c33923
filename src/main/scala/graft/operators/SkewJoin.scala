package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-mitigation for large equi-joins (SURVEY.md §4/engine scale notes).
 *
 * AQE's skew-join handling (spark.sql.adaptive.skewJoin) covers sort-merge
 * joins at runtime; explicit salting remains the tool when a handful of hot
 * keys dominate a shuffled join against a mid-sized build side (too big to
 * broadcast, too skewed to hash evenly). The probe side gets a uniform salt
 * in [0, salts); the build side is replicated once per salt value, so every
 * (key, salt) bucket joins correctly and hot keys spread over `salts`
 * reducers. Semantics-preserving for inner and left joins on equi-keys.
 */
object SkewJoin {

  /** Inner/left equi-join with salting. `salts` multiplies the build side's
    * row count — keep it small (8-64) and the build side slim. */
  def saltedEquiJoin(probe: DataFrame, build: DataFrame, key: String,
                     salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    require(joinType == "inner" || joinType == "left" || joinType == "left_outer",
      s"salting preserves semantics for inner/left equi-joins, not $joinType")
    // deterministic uniform salt derived from a stable row fingerprint
    // (rand() would break task-retry idempotency at scale)
    val salted = probe.withColumn("_salt",
      pmod(hash(col(key), monotonically_increasing_id()), lit(salts)))
    val replicated = build
      .withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Top-N heaviest keys of `df` by count — the inputs you'd salt or route
    * to a broadcast side. One partial+final aggregate. */
  def heavyHitters(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col(key).asc)
      .limit(topN)

  /**
   * Pick the salt count from the observed distribution: enough buckets to
   * spread the hottest key to ~`targetRowsPerBucket` rows each, clamped to
   * `maxSalts` (build-side replication cost is linear in salts). Returns 1
   * — i.e. "don't salt" — when no key exceeds the target. Profile on a
   * seeded sample at scale: counts scale up by 1/fraction.
   */
  def pickSalts(probe: DataFrame, key: String,
                targetRowsPerBucket: Long = 100000, maxSalts: Int = 64,
                sampleFraction: Double = 1.0): Int = {
    require(sampleFraction > 0 && sampleFraction <= 1.0)
    val src = if (sampleFraction < 1.0)
      probe.sample(withReplacement = false, sampleFraction, seed = 42L) else probe
    heavyHitters(src, key, 1).collect().headOption match {
      case None => 1
      case Some(row) =>
        val estMax = (row.getLong(1) / sampleFraction).toLong
        val want = math.ceil(estMax.toDouble / targetRowsPerBucket).toLong
        math.max(1L, math.min(maxSalts.toLong, want)).toInt
    }
  }

  /** saltedEquiJoin with the salt count profiled from the probe side (one
    * extra aggregate pass, or a cheap sampled one at scale). */
  def autoSaltedJoin(probe: DataFrame, build: DataFrame, key: String,
                     joinType: String = "inner",
                     targetRowsPerBucket: Long = 100000, maxSalts: Int = 64,
                     sampleFraction: Double = 1.0): DataFrame = {
    val salts = pickSalts(probe, key, targetRowsPerBucket, maxSalts, sampleFraction)
    if (salts == 1) probe.join(build, Seq(key), joinType)
    else saltedEquiJoin(probe, build, key, salts, joinType)
  }

  /**
   * Hybrid skew join: heavy keys (above `threshold` rows) join via broadcast
   * of their build rows; the long tail joins normally. One pass to find
   * heavy keys, then two disjoint joins unioned — the standard plan for
   * "mostly uniform + few whales" distributions at 100 TB.
   */
  def hybridSkewJoin(probe: DataFrame, build: DataFrame, key: String,
                     threshold: Long): DataFrame = {
    // whale keys are few by definition -> collect them once; the filters
    // below then push down to both scans
    val heavyKeys = probe.groupBy(col(key)).agg(count(lit(1)).as("_cnt"))
      .filter(col("_cnt") > threshold).select(col(key))
      .collect().map(_.get(0))
    if (heavyKeys.isEmpty) probe.join(build, Seq(key), "inner")
    else {
      val isHeavy = col(key).isin(heavyKeys.toIndexedSeq: _*)
      probe.filter(isHeavy).join(broadcast(build.filter(isHeavy)), Seq(key), "inner")
        .unionByName(probe.filter(!isHeavy).join(build.filter(!isHeavy), Seq(key), "inner"))
    }
  }
}
