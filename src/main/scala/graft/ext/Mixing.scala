package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Corpus mixing: cap each source's contribution to a training corpus at a
 * cost budget (chars, tokens, bytes — any per-doc cost column), keeping
 * documents in a DETERMINISTIC order so reruns select the same subset.
 * This is the "mixture weights" step of a pretraining-data build: without
 * it one over-crawled source dominates the token distribution.
 *
 * Shape: a two-phase distributed prefix sum, NOT one running-sum window per
 * source. `Window.partitionBy(source)` puts every row of a source on a
 * single task — with a handful of sources at corpus scale that is a
 * one-task sort of the largest source. Instead:
 *
 *   1. each source is split into `numBuckets` ORDER-CONTIGUOUS range
 *      buckets of `orderCol` (boundaries from one bounded
 *      `approx_percentile` sketch pass, collected once to the driver —
 *      sources × numBuckets doubles — so every downstream branch buckets
 *      rows identically);
 *   2. per-bucket exact cost totals (a tiny partial+final aggregate) turn
 *      into exclusive per-bucket offsets via a window over that
 *      sources × numBuckets row aggregate;
 *   3. buckets whose offset alone exceeds the budget are dropped wholesale
 *      (their rows are never sorted), and the survivors get
 *      `_cum = bucket offset + in-bucket running sum` under
 *      `Window.partitionBy(source, bucket)` — max task = one bucket,
 *      parallelism = sources × numBuckets.
 *
 * Because bucket boundaries are order-contiguous and per-bucket sums are
 * exact longs, `_cum` is bit-identical to the single-window formulation no
 * matter where the (approximate) boundaries fall — boundary quality only
 * affects task balance, never results.
 *
 * Requirements: `cost` must be non-negative (what a char/token/byte cost
 * is by nature; the whole-bucket prune in step 3 relies on it), and
 * `orderCol` (plus `tieCols`, if given) must be UNIQUE per source — with
 * duplicate order keys the running sum at the budget boundary, and hence
 * the kept subset, is tie-order dependent. Pass doc_id (or add it as a
 * tiebreaker) to make reruns exact.
 */
object Mixing {

  /** Docs ordered by `orderCol` within each source, kept while the running
    * `cost` total stays within `budget`. Adds `_cum` with the running total
    * (callers drop it or keep it for reporting). `orderCol` must be unique
    * per source (see class doc; use the `tieCols` overload otherwise). */
  def capPerSource(docs: DataFrame, sourceCol: String, orderCol: String,
                   cost: Column, budget: Long): DataFrame =
    capPerSource(docs, sourceCol, orderCol, cost, budget,
      numBuckets = 32, tieCols = Nil)

  /** Full form: `tieCols` complete the per-source total order when
    * `orderCol` alone is not unique; `numBuckets` bounds the largest
    * sort task (per-source rows / numBuckets, roughly).
    *
    * Small inputs skip the two-phase machinery: the bucketed form costs a
    * fixed ~4 extra jobs (percentile sketch + collect + offset aggregate)
    * that only pay off when a source no longer fits one task. The optimizer's
    * size estimate (`stats.sizeInBytes` — free, no count job) routes inputs
    * under `smallInputBytes` to the plain per-source window; both paths are
    * bit-identical by construction (the MixingSpec equality law pins it), so
    * the routing affects latency only, never results. */
  def capPerSource(docs: DataFrame, sourceCol: String, orderCol: String,
                   cost: Column, budget: Long, numBuckets: Int,
                   tieCols: Seq[String],
                   smallInputBytes: Long = 64L << 20): DataFrame =
    capWithBudget(docs.withColumn("_gbudget", lit(budget)), sourceCol,
      orderCol, cost, numBuckets, tieCols, smallInputBytes).drop("_gbudget")

  /**
   * Temperature-reweighted source budgets — the pretraining "mixture
   * weights" step proper: each source's share of `totalBudget` is
   * proportional to (its natural cost mass)^temperature. `temperature = 1`
   * keeps natural proportions; lowering it flattens the mix toward uniform
   * (Pareto-dominant crawl sources shrink, small curated sources grow);
   * the common published setting is around 0.5. Selection within a source
   * is then the deterministic ordered prefix of [[capPerSource]].
   *
   * Budget arithmetic is engine-reproducible BY CONSTRUCTION: weights are
   * `floor(c^temperature)` as integers, and each budget is
   * `totalBudget * w / Σw` in integer arithmetic (BigInt — no overflow at
   * any corpus size). For `temperature = 0.5` the weight is
   * `floor(sqrt(c))` where sqrt is IEEE-correctly-rounded on every
   * platform, so an independent engine computes bit-identical budgets (the
   * q76 DuckDB oracle does exactly that); other temperatures go through
   * `pow`, which is faithfully- but not correctly-rounded — deterministic
   * within a JVM, with a documented (and practically unobserved) 1-ULP
   * cross-engine hazard at floor boundaries.
   *
   * Driver traffic: one (source, total-cost) row per source — bounded by
   * the source count, like the bucketize splitter collect.
   */
  def temperatureMix(docs: DataFrame, sourceCol: String, orderCol: String,
                     cost: Column, totalBudget: Long,
                     temperature: Double = 0.5, numBuckets: Int = 32,
                     tieCols: Seq[String] = Nil): DataFrame = {
    require(temperature > 0 && temperature <= 1,
      s"temperature must be in (0, 1], got $temperature")
    require(totalBudget >= 0, s"totalBudget must be >= 0, got $totalBudget")
    val spark = docs.sparkSession
    import spark.implicits._
    val totals = docs
      .groupBy(col(sourceCol).cast("string").as("_src"))
      .agg(sum(cost.cast("long")).as("_c")).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) 0L else r.getLong(1)))
      .toSeq.sortBy(_._1)
    val budgets = temperatureBudgets(totals, totalBudget, temperature)
    capPerSourceWith(docs, sourceCol, orderCol, cost, budgets,
      numBuckets, tieCols)
  }

  /** Integer temperature-weighted budget split: `totalBudget * floor(c^τ) /
    * Σ floor(c^τ)` per source, BigInt arithmetic (see [[temperatureMix]]'s
    * reproducibility note). Shared by the batch operator and the streaming
    * mix stage so both derive bit-identical budgets from the same masses. */
  private[graft] def temperatureBudgets(masses: Seq[(String, Long)],
                                        totalBudget: Long,
                                        temperature: Double): Seq[(String, Long)] = {
    val weights = masses.sortBy(_._1).map { case (src, c) =>
      src -> BigInt(math.floor(math.pow(math.max(c, 0L).toDouble,
        temperature)).toLong)
    }
    val wSum = weights.map(_._2).sum
    weights.map { case (src, w) =>
      (src, if (wSum == 0) 0L else (BigInt(totalBudget) * w / wSum).toLong)
    }
  }

  /** Per-source-budget prefix cap (the generalized [[capPerSource]]):
    * sources absent from `budgets` are DROPPED (budget 0 ≠ unlimited). */
  private[graft] def capPerSourceWith(docs: DataFrame, sourceCol: String,
                                      orderCol: String, cost: Column,
                                      budgets: Seq[(String, Long)],
                                      numBuckets: Int = 32,
                                      tieCols: Seq[String] = Nil): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bdf = budgets.toDF("_tsrc", "_gbudget")
    capWithBudget(
      docs.join(broadcast(bdf),
        col(sourceCol).cast("string") <=> col("_tsrc")).drop("_tsrc"),
      sourceCol, orderCol, cost, numBuckets, tieCols)
      .drop("_gbudget")
  }

  /** Shared prefix-cap machinery over a per-row `_gbudget` column (constant
    * within a source — [[capPerSource]] passes one literal, [[temperatureMix]]
    * a broadcast per-source map). */
  private def capWithBudget(docs: DataFrame, sourceCol: String,
                            orderCol: String, cost: Column, numBuckets: Int,
                            tieCols: Seq[String],
                            smallInputBytes: Long = 64L << 20): DataFrame = {
    val ordKeys = (orderCol +: tieCols).map(col)
    val estBytes = docs.queryExecution.optimizedPlan.stats.sizeInBytes
    val effectiveBuckets =
      if (estBytes <= BigInt(smallInputBytes)) 1 else numBuckets
    bucketize(docs, sourceCol, orderCol, effectiveBuckets) match {
      case None =>
        // unsupported order-key type (or numBuckets == 1): single window
        val w = Window.partitionBy(sourceCol).orderBy(ordKeys: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        docs.withColumn("_cum", sum(cost.cast("long")).over(w))
          .filter(col("_cum") <= col("_gbudget"))
      case Some(bucketed) =>
        val costed = bucketed.withColumn("_gc", cost.cast("long"))
        // tiny aggregate: sources × numBuckets rows → exclusive offsets
        val offs = costed
          .groupBy(col(sourceCol).cast("string").as("_gsrc"),
            col("_gbkt").as("_gb"))
          .agg(sum("_gc").as("_gtot"))
          .withColumn("_goff", coalesce(
            sum("_gtot").over(Window.partitionBy("_gsrc").orderBy("_gb")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select("_gsrc", "_gb", "_goff")
        val w = Window.partitionBy(col(sourceCol), col("_gbkt"))
          .orderBy(ordKeys: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        costed
          .join(broadcast(offs),
            col(sourceCol).cast("string") <=> col("_gsrc") &&
              col("_gbkt") === col("_gb"))
          .filter(col("_goff") <= col("_gbudget")) // whole-bucket prune (cost >= 0)
          .withColumn("_cum", col("_goff") + sum(col("_gc")).over(w))
          .filter(col("_cum") <= col("_gbudget"))
          .drop("_gbkt", "_gc", "_gsrc", "_gb", "_goff")
    }
  }

  /** Order-contiguous range-bucket assignment: adds `_gbkt` (0-based) such
    * that within a source, orderCol(a) < orderCol(b) implies
    * bkt(a) <= bkt(b). None when the order-key type has no monotone
    * numeric proxy (caller falls back to the single-window form).
    * Boundary sketch values are collected ONCE so every plan branch
    * buckets rows identically regardless of sketch nondeterminism. */
  private[graft] def bucketize(docs: DataFrame, sourceCol: String,
                               orderCol: String,
                               numBuckets: Int): Option[DataFrame] = {
    if (numBuckets <= 1) return None
    monotoneKey(docs.schema(orderCol).dataType).map { mono =>
      val spark = docs.sparkSession
      import spark.implicits._
      val tagged = docs.withColumn("_gok", mono(col(orderCol)))
      val fracs = (1 until numBuckets).map(i => i.toDouble / numBuckets)
      // bounded driver collect: one row per source (splitter arrays)
      val splitRows = tagged
        .groupBy(col(sourceCol).cast("string").as("_gsrc"))
        .agg(expr(s"approx_percentile(_gok, array(${fracs.mkString(",")}), 10000)")
          .as("_gsplits"))
        .collect()
        .map(r => (r.getString(0), Option(r.getSeq[Double](1))))
      val splits = splitRows.toSeq.toDF("_gsrc", "_gsplits")
      tagged
        .join(broadcast(splits),
          col(sourceCol).cast("string") <=> col("_gsrc"), "left")
        .withColumn("_gbkt", when(col("_gsplits").isNull, lit(0))
          .otherwise(size(filter(col("_gsplits"), s => s < col("_gok")))))
        .drop("_gsrc", "_gsplits", "_gok")
    }
  }

  /** Monotone numeric proxy of an order key: k1 < k2 implies
    * proxy(k1) <= proxy(k2) (ties may collapse — they only share a bucket,
    * the in-bucket sort still uses the full key). Strings take their first
    * 7 UTF-8 bytes zero-padded as an unsigned integer — monotone under
    * Spark's binary string collation. */
  private def monotoneKey(dt: DataType): Option[Column => Column] = dt match {
    case _: NumericType | DateType | TimestampType | TimestampNTZType |
         BooleanType =>
      Some(c => c.cast("double"))
    case StringType =>
      Some(c => conv(hex(substring(rpad(c, 7, "\u0000").cast("binary"), 1, 7)),
        16, 10).cast("double"))
    case _ => None
  }
  /**
   * Cluster-balanced sampling — temperature mixing where the "source" is a
   * LATENT topic cluster of the document's embedding rather than a
   * provenance column. Provenance balancing can't see that one crawl
   * source is 80% the same topic; this derives `cluster_id` from `k`
   * spherical k-means centroids over `embeddingCol`
   * ([[Similarity.assignClusters]] — bounded driver-sample training, one
   * map-only argmax labeling pass) and then runs the standard
   * [[temperatureMix]] budget math over the clusters: budget per topic ∝
   * (its natural cost mass)^temperature, selection = the deterministic
   * ordered prefix. The whole stage adds ONE aggregate (cluster masses)
   * and the usual bucketed prefix-cap shuffles on top of the labeling
   * projection — no new shuffle shapes at 100 TB.
   *
   * Returned rows keep `cluster_id` (reporting/debug); rows with null or
   * wrong-dimension embeddings are dropped by the labeling step.
   * Deterministic end to end (sampling, init, budgets, prefix all
   * seeded/integer), so reruns select the identical subset.
   */
  def clusterBalancedSample(docs: DataFrame, idCol: String,
                            embeddingCol: String, cost: Column,
                            totalBudget: Long, k: Int,
                            temperature: Double = 0.5,
                            kmeansIters: Int = 4,
                            numBuckets: Int = 32): DataFrame = {
    val labeled = Similarity.assignClusters(docs, idCol, embeddingCol, k,
      kmeansIters)
    temperatureMix(labeled, "cluster_id", idCol, cost, totalBudget,
      temperature, numBuckets)
  }

  /** One stage of a [[phasedMix]] schedule: its output label, its total
    * cost budget, and its mixture temperature. */
  case class MixPhase(name: String, budget: Long, temperature: Double = 0.5)

  /**
   * Multi-phase (annealing/curriculum) mixing schedule: phase k selects a
   * deterministic temperature-mixed subset from the docs NOT selected by
   * phases 0..k-1, under its own `(budget, temperature)` — the published
   * pretrain-then-anneal pattern: a large phase at τ≈0.5 over the whole
   * corpus, then an annealing phase at a different temperature over what
   * REMAINS, so the anneal never re-spends documents the earlier phase
   * already consumed. Per-source budgets re-derive from the remaining
   * masses at each phase boundary with the same integer `floor(c^τ)`
   * arithmetic as [[temperatureMix]] (engine-reproducible at τ = 0.5 —
   * the q83 DuckDB oracle recomputes the full two-phase selection
   * hash-exact). Output = the selected rows tagged with a `phase` column;
   * a document appears in at most one phase.
   *
   * Each phase boundary materializes the phase's selected ids
   * (localCheckpoint — ids only, bounded), so phase k+1's plan anti-joins
   * a checkpointed id set instead of re-deriving every earlier phase.
   * Cost: P phases × (one bounded mass collect + the standard bucketed
   * prefix-cap shuffles) — the schedule length is small by nature.
   */
  def phasedMix(docs: DataFrame, sourceCol: String, idCol: String,
                cost: Column, phases: Seq[MixPhase], numBuckets: Int = 32,
                tieCols: Seq[String] = Nil): DataFrame = {
    require(phases.nonEmpty, "phasedMix needs at least one phase")
    require(phases.map(_.name).distinct.length == phases.length,
      s"phase names must be unique, got ${phases.map(_.name)}")
    var remaining = docs
    val parts = phases.map { ph =>
      val sel = temperatureMix(remaining, sourceCol, idCol, cost, ph.budget,
        ph.temperature, numBuckets, tieCols).drop("_cum")
      val selIds = sel.select(col(idCol).as("_sel_id")).localCheckpoint()
      remaining = remaining
        .join(selIds, col(idCol) === col("_sel_id"), "left_anti")
      sel.withColumn("phase", lit(ph.name))
    }
    parts.reduce(_ unionByName _)
  }

  /** [[clusterBalancedSample]] against PRE-TRAINED centroids (a
    * [[Similarity.trainClusterCentroids]] artifact or an ANN index's
    * `centroids/`) instead of training in-call — the form the STREAMING
    * mix stage labels with (frozen centroids keep cluster ids stable
    * across batches), and the batch twin its single-batch parity law
    * compares against. Same budget math, same deterministic prefix;
    * rows with null or wrong-dimension embeddings drop in labeling. */
  def clusterBalancedSampleWith(docs: DataFrame, idCol: String,
                                embeddingCol: String, cost: Column,
                                totalBudget: Long,
                                cents: IndexedSeq[Seq[Double]],
                                temperature: Double = 0.5,
                                numBuckets: Int = 32): DataFrame = {
    val labeled = Similarity.assignClustersWith(docs, embeddingCol, cents)
    temperatureMix(labeled, "cluster_id", idCol, cost, totalBudget,
      temperature, numBuckets)
  }

  // ------------------------------------------------------------------
  // Exact stratified split
  // ------------------------------------------------------------------

  /**
   * Exact stratified K-fold split — the train/val/test cut that holds the
   * strata mix constant across folds (per-language, per-source, per-topic
   * splits): within each stratum, rows order by the PORTABLE hash
   * md5("<seed>:<id>") (the q67 discipline — any engine reproduces it)
   * and fold k takes ranks in `(cut_{k-1}, cut_k]` where
   * `cut_j = floor(n_s * (f_1 + … + f_j))`, the fraction sum evaluated
   * LEFT TO RIGHT in IEEE doubles (pinned, so 0.8 + 0.1 means the exact
   * double an oracle computes, not a decimal 0.9). The last fold takes
   * every remainder rank, so folds partition each stratum exactly —
   * unlike `randomSplit`, whose per-fold sizes are binomial draws.
   *
   * Returns the input plus an int `fold` column (1-based).
   *
   * Scale shape: the within-stratum rank is the bucketized two-phase
   * prefix (the [[temperatureMix]] machinery — order-contiguous range
   * buckets from ONE splitter collect, per-(stratum, bucket) row_number
   * plus broadcast exclusive offsets), never a single-task
   * whole-stratum sort; the only driver traffic is one count per
   * stratum and the splitter sketches.
   */
  def stratifiedSplit(docs: DataFrame, idCol: String, strataCol: String,
                      fractions: Seq[Double], seed: Long = 42L,
                      numBuckets: Int = 32,
                      // test seam (the capPerSource convention): 0 forces
                      // the bucketed plan on small inputs
                      smallInputBytes: Long = 64L << 20): DataFrame = {
    require(fractions.size >= 2, "need at least two folds")
    require(fractions.forall(_ > 0), "fractions must be positive")
    require(math.abs(fractions.sum - 1.0) <= 1e-9,
      s"fractions must sum to 1, got ${fractions.sum}")
    val spark = docs.sparkSession
    import spark.implicits._
    // K-1 cumulative cut fractions, left-to-right IEEE sum (documented)
    val cum = fractions.scanLeft(0.0)(_ + _).tail.dropRight(1)
    // bounded collect: one row per stratum -> its K-1 integer cut ranks
    val cuts = docs
      .groupBy(col(strataCol).cast("string").as("_ssrc"))
      .agg(count(lit(1)).as("_sn"))
      .collect()
      .map { r =>
        val n = r.getLong(1)
        (r.getString(0), cum.map(f => math.floor(n * f).toLong))
      }.toSeq.toDF("_ssrc", "_scuts")
    val tagged = docs.withColumn("_sh",
      md5(concat_ws(":", lit(seed.toString), col(idCol).cast("string"))))
    rankWithinGroup(tagged, strataCol, "_sh", idCol, numBuckets,
        smallInputBytes)
      .join(broadcast(cuts),
        col(strataCol).cast("string") <=> col("_ssrc"))
      .withColumn("fold",
        (lit(1) + size(filter(col("_scuts"), c => c < col("_grank"))))
          .cast("int"))
      .drop("_sh", "_grank", "_ssrc", "_scuts")
  }

  /** Deterministic 1-based position of each row within its group under
    * (orderCol, tieCol) order — the ranking twin of the prefix-cap
    * machinery: same order-contiguous range buckets, per-(group, bucket)
    * row_number plus broadcast exclusive COUNT offsets. Adds `_grank`. */
  private def rankWithinGroup(docs: DataFrame, groupCol: String,
                              orderCol: String, tieCol: String,
                              numBuckets: Int,
                              smallInputBytes: Long = 64L << 20): DataFrame = {
    val ordKeys = Seq(col(orderCol), col(tieCol))
    val estBytes = docs.queryExecution.optimizedPlan.stats.sizeInBytes
    val effectiveBuckets =
      if (estBytes <= BigInt(smallInputBytes)) 1 else numBuckets
    bucketize(docs, groupCol, orderCol, effectiveBuckets) match {
      case None =>
        val w = Window.partitionBy(groupCol).orderBy(ordKeys: _*)
        docs.withColumn("_grank", row_number().over(w).cast("long"))
      case Some(bucketed) =>
        // tiny aggregate: groups × numBuckets rows → exclusive offsets
        val offs = bucketed
          .groupBy(col(groupCol).cast("string").as("_gsrc"),
            col("_gbkt").as("_gb"))
          .agg(count(lit(1)).as("_gtot"))
          .withColumn("_goff", coalesce(
            sum("_gtot").over(Window.partitionBy("_gsrc").orderBy("_gb")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select("_gsrc", "_gb", "_goff")
        val w = Window.partitionBy(col(groupCol), col("_gbkt"))
          .orderBy(ordKeys: _*)
        bucketed
          .join(broadcast(offs),
            col(groupCol).cast("string") <=> col("_gsrc") &&
              col("_gbkt") === col("_gb"))
          .withColumn("_grank", col("_goff") + row_number().over(w))
          .drop("_gbkt", "_gsrc", "_gb", "_goff")
    }
  }
}
