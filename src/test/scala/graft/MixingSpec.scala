package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.Mixing

/** Laws for the two-phase (bucketed) per-source budget cap: the bucketed
  * prefix sum must be bit-identical to the single-window formulation, while
  * actually SPLITTING a skewed source across >1 bucket (the whole point —
  * `Window.partitionBy(source)` alone is one task per source). */
class MixingSpec extends SparkSpec {
  import spark.implicits._

  /** 3 sources; "web" holds ~90% of rows (the skew case the bucketing is
    * for). String doc ids with non-uniform prefixes. */
  private def skewedDocs(n: Int = 2000): DataFrame = {
    val rows = (0 until n).map { i =>
      val src = if (i % 10 == 0) (if (i % 20 == 0) "wiki" else "books")
                else "web"
      val cost = 10 + (i * 37) % 90
      (f"doc_${(i * 2654435761L) % 100000}%05d_$i", src, cost)
    }
    rows.toDF("doc_id", "source", "cost")
  }

  /** Reference: the one-window-per-source formulation (numBuckets=1 path). */
  private def singleWindow(docs: DataFrame, budget: Long): DataFrame =
    Mixing.capPerSource(docs, "source", "doc_id", col("cost"), budget,
      numBuckets = 1, tieCols = Nil)

  test("bucketed capPerSource == single-window, bit-exact (string order key)") {
    val docs = skewedDocs()
    for (budget <- Seq(500L, 5000L, 50000L)) {
      val a = singleWindow(docs, budget)
        .select("doc_id", "source", "cost", "_cum").collect().toSet
      val b = Mixing.capPerSource(docs, "source", "doc_id", col("cost"),
          budget, numBuckets = 8, tieCols = Nil, smallInputBytes = 0L)
        .select("doc_id", "source", "cost", "_cum").collect().toSet
      assert(b === a, s"bucketed != single-window at budget=$budget")
      assert(a.nonEmpty)
    }
  }

  test("bucketed capPerSource == single-window (numeric order key)") {
    val docs = skewedDocs().withColumn("ord",
      (crc32(col("doc_id")) % 100000).cast("long"))
    // crc32-derived order values can collide: doc_id completes the order
    val a = Mixing.capPerSource(docs, "source", "ord", col("cost"), 8000L,
        numBuckets = 1, tieCols = Seq("doc_id"))
      .select("doc_id", "_cum").collect().toSet
    val b = Mixing.capPerSource(docs, "source", "ord", col("cost"), 8000L,
        numBuckets = 8, tieCols = Seq("doc_id"), smallInputBytes = 0L)
      .select("doc_id", "_cum").collect().toSet
    assert(b === a)
    assert(a.nonEmpty)
  }

  test("a 90%-skew source spans >1 bucket; buckets are order-contiguous") {
    val docs = skewedDocs()
    val bucketed = Mixing.bucketize(docs, "source", "doc_id", 8)
      .getOrElse(fail("string order key must be bucketizable"))
    val byBkt = bucketed.filter(col("source") === "web")
      .groupBy("_gbkt")
      .agg(count(lit(1)).as("n"), min("doc_id").as("lo"), max("doc_id").as("hi"))
      .orderBy("_gbkt")
      .collect()
    assert(byBkt.length > 1,
      s"big source landed in ${byBkt.length} bucket(s) — still one task")
    // no bucket holds everything (bounded-task law)
    val total = byBkt.map(_.getLong(1)).sum
    assert(byBkt.map(_.getLong(1)).max < total,
      "one bucket holds the whole source")
    // order-contiguity: bucket k's max id < bucket k+1's min id
    byBkt.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getString(3) < b.getString(2),
          s"buckets ${a.getInt(0)} and ${b.getInt(0)} overlap in order-key range")
      case _ =>
    }
  }

  test("monotone proxy handles short ids, prefixes, and control chars") {
    // "a" < "a\u0001" < "a " < "ab" in UTF8-binary order; a NUL-padded
    // 7-byte prefix key must never invert those (ties may share a bucket)
    val docs = Seq("a", "a\u0001", "a ", "ab", "b", "aaaaaaaaaa", "aaaaaaaaab")
      .zipWithIndex.map { case (id, i) => (id, "s", 1 + i) }
      .toDF("doc_id", "source", "cost")
    val bucketed = Mixing.bucketize(docs, "source", "doc_id", 4).get
      .orderBy("doc_id").select("doc_id", "_gbkt")
      .as[(String, Int)].collect()
    bucketed.sliding(2).foreach {
      case Array((id1, b1), (id2, b2)) =>
        assert(b1 <= b2, s"bucket order inverted: '$id1'->$b1 vs '$id2'->$b2")
      case _ =>
    }
    // and the capped output still matches the single-window reference
    val a = singleWindow(docs, 10L).select("doc_id", "_cum").collect().toSet
    val b = Mixing.capPerSource(docs, "source", "doc_id", col("cost"), 10L,
        numBuckets = 4, tieCols = Nil, smallInputBytes = 0L)
      .select("doc_id", "_cum").collect().toSet
    assert(b === a)
  }

  test("size routing: small inputs take the single-window plan, forced-bucketed identical") {
    val docs = skewedDocs()
    // default smallInputBytes (64 MB): this tiny frame routes to the plain
    // window — no bucket machinery in the plan, no sketch/offset jobs
    val fast = Mixing.capPerSource(docs, "source", "doc_id", col("cost"), 5000L,
      numBuckets = 8, tieCols = Nil)
    assert(!fast.queryExecution.optimizedPlan.toString.contains("_gbkt"),
      "small input should skip the bucketed form")
    // forcing the bucketed form produces byte-identical results
    val slow = Mixing.capPerSource(docs, "source", "doc_id", col("cost"), 5000L,
      numBuckets = 8, tieCols = Nil, smallInputBytes = 0L)
    assert(slow.queryExecution.optimizedPlan.toString.contains("_gbkt"))
    assert(fast.select("doc_id", "_cum").collect().toSet ===
      slow.select("doc_id", "_cum").collect().toSet)
  }

  test("temperatureMix: budgets follow floor(sqrt)-weight integer math; tau flattens the mix") {
    // skewed corpus: big source 10x the mass of the small one
    val rows =
      (0 until 100).map(i => ("big", i.toLong, 100L)) ++
        (0 until 10).map(i => ("small", 1000L + i, 100L))
    val df = rows.toDF("source", "doc_id", "cost")
    val out = Mixing.temperatureMix(df, "source", "doc_id", col("cost"),
      totalBudget = 5500L, temperature = 0.5)
    val kept = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // hand-computed: mass big=10000, small=1000; w = floor(sqrt): 100, 31
    // (sqrt(1000)=31.62); budgets = 5500*w/131 -> big 4198, small 1301 ->
    // kept prefixes 41 and 10 docs (small is budget-capped above its mass)
    assert(kept === Map("big" -> 41L, "small" -> 10L), s"got $kept")
    // tau=1 for contrast: natural proportions — w = mass, budgets
    // 5500*10000/11000 = 5000 and 500 -> 50 and 5 docs
    val nat = Mixing.temperatureMix(df, "source", "doc_id", col("cost"),
      totalBudget = 5500L, temperature = 1.0)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(nat === Map("big" -> 50L, "small" -> 5L), s"got $nat")
    // the flattening law itself: lower tau gives the small source a
    // strictly larger share of kept docs
    assert(kept("small").toDouble / kept.values.sum >
      nat("small").toDouble / nat.values.sum)
  }

  test("temperatureMix: selection is capPerSource's prefix under the derived budget") {
    val rnd = new scala.util.Random(3)
    val rows = (0 until 200).map { i =>
      (s"s${i % 3}", i.toLong, (1 + rnd.nextInt(50)).toLong)
    }
    val df = rows.toDF("source", "doc_id", "cost")
    val out = Mixing.temperatureMix(df, "source", "doc_id", col("cost"),
      totalBudget = 2000L, temperature = 0.5).cache()
    // derive the budgets the same way and check each source's kept set is
    // exactly the capPerSource prefix at that budget
    val masses = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val w = masses.view.mapValues(c => math.floor(math.sqrt(c.toDouble)).toLong).toMap
    val wSum = w.values.sum
    for ((src, wi) <- w) {
      val bud = 2000L * wi / wSum
      val expect = Mixing.capPerSource(df.filter(col("source") === src),
        "source", "doc_id", col("cost"), bud)
      assert(out.filter(col("source") === src).exceptAll(expect).count() === 0)
      assert(expect.exceptAll(out.filter(col("source") === src)).count() === 0)
    }
    out.unpersist()
  }

  test("whole-bucket prune: over-budget buckets drop without changing results") {
    // budget so small only the first few docs survive — later buckets of
    // the big source are pruned by offset alone; result must still match
    val docs = skewedDocs(4000)
    val a = singleWindow(docs, 300L).select("doc_id", "_cum").collect().toSet
    val b = Mixing.capPerSource(docs, "source", "doc_id", col("cost"), 300L,
        numBuckets = 16, tieCols = Nil, smallInputBytes = 0L)
      .select("doc_id", "_cum").collect().toSet
    assert(b === a)
    assert(a.nonEmpty && a.size < 100)
  }
  test("phasedMix: phases disjoint, budgets honored per phase over remaining mass, deterministic") {
    val rnd = new scala.util.Random(73)
    // skewed corpus: big has ~9x small's docs; unique cost per doc
    val docs = (0L until 400L).map { i =>
      (i, if (i % 10 == 0) "small" else "big", 50L + rnd.nextInt(150))
    }.toDF("doc_id", "source", "cost")
    val total = docs.agg(sum("cost")).head().getLong(0)
    val phases = Seq(
      graft.ext.Mixing.MixPhase("pretrain", total * 2 / 5, 0.5),
      graft.ext.Mixing.MixPhase("anneal", total / 5, 1.0))
    val out = graft.ext.Mixing.phasedMix(docs, "source", "doc_id",
      col("cost"), phases).cache()

    // disjoint: a doc appears in at most one phase
    assert(out.groupBy("doc_id").count().filter(col("count") > 1).count() === 0,
      "a doc was selected by two phases")

    // phase 1 == plain temperatureMix at the same knobs
    val p1 = out.filter(col("phase") === "pretrain")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val direct1 = graft.ext.Mixing.temperatureMix(docs, "source", "doc_id",
      col("cost"), total * 2 / 5, temperature = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(p1 === direct1, "phase 1 != the single-phase operator")

    // phase 2 == temperatureMix over the REMAINING corpus (fresh masses)
    val p2 = out.filter(col("phase") === "anneal")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val remaining = docs.filter(!col("doc_id").isInCollection(p1))
    val direct2 = graft.ext.Mixing.temperatureMix(remaining, "source",
      "doc_id", col("cost"), total / 5, temperature = 1.0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(p2 === direct2, "phase 2 != the operator over the remainder")
    assert(p2.nonEmpty && (p1 intersect p2).isEmpty)

    // per-phase budgets honored against independently-derived budgets
    val remMass = remaining.groupBy(col("source").cast("string").as("s"))
      .agg(sum("cost").as("c")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    val buds2 = graft.ext.Mixing.temperatureBudgets(remMass, total / 5, 1.0).toMap
    val spent2 = out.filter(col("phase") === "anneal")
      .groupBy(col("source").cast("string").as("s")).agg(sum("cost").as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    spent2.foreach { case (src, c) =>
      assert(c <= buds2(src), s"anneal $src spent $c > budget ${buds2(src)}")
    }

    // determinism: rerun selects identical (phase, doc) pairs
    val rerun = graft.ext.Mixing.phasedMix(docs, "source", "doc_id",
      col("cost"), phases).select("phase", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rerun === out.select("phase", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet)
    out.unpersist()
    ()
  }

  test("clusterBalancedSample: latent topics rebalanced; deterministic; per-cluster budgets honored") {
    val rnd = new scala.util.Random(61)
    // two planted topics in 16-dim: axis-0-heavy (90% of docs) and
    // axis-1-heavy (10%), unit-ish with small jitter — spherical k-means
    // at k=2 separates them exactly
    def vec(axis: Int) = {
      val a = Array.fill(16)(rnd.nextGaussian() * 0.05f)
      a(axis) = 1f + rnd.nextGaussian().toFloat * 0.05f
      a.toSeq
    }
    val docs = (0L until 1000L).map { i =>
      val axis = if (i % 10 == 0) 1 else 0        // 100 small-topic docs
      (i, vec(axis), 100L)                        // uniform cost 100
    }.toDF("doc_id", "embedding", "cost")

    val budget = 30000L // natural masses: big 90000, small 10000
    val kept = graft.ext.Mixing.clusterBalancedSample(docs, "doc_id",
      "embedding", col("cost"), budget, k = 2, temperature = 0.5)
    val byCluster = kept.groupBy("cluster_id")
      .agg(sum("cost").as("c"), count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap

    // the labeling itself must recover the plant: cluster sizes 900/100
    val labeled = graft.ext.Similarity.assignClusters(docs, "doc_id", "embedding", 2)
    val sizes = labeled.groupBy("cluster_id").count()
      .collect().map(r => r.getLong(1)).sorted
    assert(sizes.toSeq === Seq(100L, 900L), s"k-means missed the plant: ${sizes.toSeq}")

    // budgets honored: per-cluster kept cost <= its temperature budget,
    // computed independently through the same public integer math
    val masses = labeled.groupBy(col("cluster_id").cast("string").as("s"))
      .agg(sum("cost").as("c")).collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val budgets = graft.ext.Mixing.temperatureBudgets(masses, budget, 0.5).toMap
    byCluster.foreach { case (cl, (c, _)) =>
      assert(c <= budgets(cl.toString), s"cluster $cl kept $c > budget ${budgets(cl.toString)}")
    }
    // balancing: at tau=0.5 the small topic's kept share must EXCEED its
    // natural 10% share (sqrt weighting: 100/400 = 25% of the budget)
    val total = byCluster.values.map(_._1).sum
    val smallCluster = labeled.filter(col("doc_id") % 10 === 0)
      .select("cluster_id").head().getInt(0)
    val smallShare = byCluster(smallCluster)._1.toDouble / total
    assert(smallShare > 0.2, s"small topic share $smallShare not rebalanced")
    assert(total <= budget, s"total kept $total exceeds the global budget")

    // determinism: a rerun selects the identical subset
    val ids1 = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = graft.ext.Mixing.clusterBalancedSample(docs, "doc_id",
      "embedding", col("cost"), budget, k = 2, temperature = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 === ids2, "rerun selected a different subset")
  }

  test("stratifiedSplit: exact per-stratum fold sizes, a partition, " +
      "deterministic, repartition-invariant") {
    val docs = skewedDocs(2000).select(col("doc_id"), col("source"))
    val fracs = Seq(0.8, 0.1, 0.1)
    val split = Mixing.stratifiedSplit(docs, "doc_id", "source", fracs)
    val rows = split.collect().map(r => (r.getString(0), r.getString(1),
      r.getInt(2)))
    // a partition of the input: every row exactly once, folds in 1..3
    assert(rows.length === 2000)
    assert(rows.map(_._1).distinct.length === 2000)
    assert(rows.forall(t => t._3 >= 1 && t._3 <= 3))
    // EXACT sizes: fold k within stratum s == cut_k - cut_{k-1} with
    // cut_j = floor(n_s * left-to-right cumsum) — the operator's contract
    val bySrc = rows.groupBy(_._2)
    for ((src, rs) <- bySrc) {
      val n = rs.length.toLong
      val cum = fracs.scanLeft(0.0)(_ + _).tail
      val cuts = cum.dropRight(1).map(f => math.floor(n * f).toLong) :+ n
      val sizes = (1 to 3).map(k => rs.count(_._3 == k).toLong)
      val expected = cuts.zip(0L +: cuts.dropRight(1)).map(t => t._1 - t._2)
      assert(sizes === expected, s"stratum $src sizes")
    }
    // deterministic + physical-layout invariant
    val again = Mixing.stratifiedSplit(docs.repartition(17), "doc_id",
        "source", fracs)
      .collect().map(r => (r.getString(0), r.getInt(2))).toMap
    assert(rows.map(t => t._1 -> t._3).toMap === again)
    // a different seed reshuffles membership but keeps the exact sizes
    val other = Mixing.stratifiedSplit(docs, "doc_id", "source", fracs,
        seed = 7L)
      .collect().map(r => (r.getString(0), r.getInt(2))).toMap
    assert(other !== rows.map(t => t._1 -> t._3).toMap)
    assert((1 to 3).map(k => other.values.count(_ == k)) ===
      (1 to 3).map(k => rows.count(_._3 == k)))
  }

  test("stratifiedSplit: bucketed plan == single-window plan, bit-exact") {
    val docs = skewedDocs(2000).select(col("doc_id"), col("source"))
    val a = Mixing.stratifiedSplit(docs, "doc_id", "source",
        Seq(0.7, 0.2, 0.1))
      .collect().map(r => (r.getString(0), r.getInt(2))).toMap
    val b = Mixing.stratifiedSplit(docs, "doc_id", "source",
        Seq(0.7, 0.2, 0.1), numBuckets = 8, smallInputBytes = 0L)
      .collect().map(r => (r.getString(0), r.getInt(2))).toMap
    assert(a === b)
  }
}
