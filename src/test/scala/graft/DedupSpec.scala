package graft

import graft.ext.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("exact: representative is lexicographic min, dup_cnt correct") {
    val df = Seq(
      ("k1", 5.0, 30.0), ("k1", 3.0, 99.0), ("k1", 3.0, 10.0),
      ("k2", 7.0, 1.0)).toDF("k", "q", "p")
    val out = Dedup.exact(df, Seq("k"), Seq("q", "p")).orderBy("k").collect()
    assert(out(0).getString(0) === "k1")
    assert(out(0).getDouble(1) === 3.0)
    assert(out(0).getDouble(2) === 10.0) // min struct: (3.0, 10.0) < (3.0, 99.0)
    assert(out(0).getLong(3) === 3L)
    assert(out(1).getLong(3) === 1L)
  }

  test("shingles: distinct word k-grams; short text collapses to whole text") {
    val df = Seq("a b c d", "x y").toDF("t")
      .select(Dedup.shingles(col("t"), 3).as("sh"))
    val rows = df.collect().map(_.getSeq[String](0).toSet)
    assert(rows(0) === Set("a b c", "b c d"))
    assert(rows(1) === Set("x y")) // fewer than k tokens
  }

  test("jaccard_sorted equals generic jaccard on hashed shingles") {
    val d = sf("sf0.001", "documents").limit(60)
      .select(array_sort(Dedup.shingleHashes(col("text"))).as("h"))
    val pairs = d.alias("a").crossJoin(d.alias("b")).limit(500)
      .select(graft.functions.EsFunctions.jaccard_sorted(col("a.h"), col("b.h")).as("fast"),
        Dedup.jaccard(col("a.h"), col("b.h")).as("ref"))
    assert(pairs.filter(col("fast") =!= col("ref")).count() === 0)
  }

  test("jaccard: exact on known sets") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
      .select(Dedup.jaccard(col("x"), col("y")).as("j"))
    assert(math.abs(df.head().getDouble(0) - 0.5) < 1e-12)
  }

  test("native shingle_hashes equals the HOF reference formulation") {
    val texts = sf("sf0.001", "documents").select("text").limit(100)
      .union(Seq("", "one", "one two", "  spaced   out  words here ").toDF("text"))
    val native = texts.select(Dedup.shingleHashes(col("text"), 3).as("h")).collect()
    val hof = texts.select(Dedup.shingleHashesHof(col("text"), 3).as("h")).collect()
    assert(native.map(_.getSeq[Long](0)).toSeq === hof.map(_.getSeq[Long](0)).toSeq)
  }

  test("native minhash_sig equals the HOF reference formulation") {
    val texts = sf("sf0.001", "documents").select("text").limit(50)
    val base = texts.select(Dedup.shingleHashes(col("text")).as("h"))
    val native = base.select(Dedup.minhashSignature(col("h"), 32).as("s")).collect()
    val hof = base.select(Dedup.minhashSignatureHof(col("h"), 32).as("s")).collect()
    assert(native.map(_.getSeq[Long](0)).toSeq === hof.map(_.getSeq[Long](0)).toSeq)
  }

  test("minhash signature similarity tracks jaccard") {
    // two texts sharing most shingles vs two unrelated texts
    val near = ("the quick brown fox jumps over the lazy dog tonight",
      "the quick brown fox jumps over the lazy cat tonight")
    val far = ("alpha beta gamma delta epsilon zeta eta theta",
      "one two three four five six seven eight")
    def sigAgreement(a: String, b: String): Double = {
      val df = Seq(a, b).toDF("t")
        .select(Dedup.minhashSignature(Dedup.shingleHashes(col("t")), 64).as("sig"))
      val Array(s1, s2) = df.collect().map(_.getSeq[Long](0))
      s1.zip(s2).count { case (x, y) => x == y }.toDouble / s1.length
    }
    assert(sigAgreement(near._1, near._2) > 0.5)
    assert(sigAgreement(far._1, far._2) < 0.2)
  }

  test("minhashNearDups recall: finds planted near-duplicates (sf0.001 docs + clones)") {
    val docs = sf("sf0.001", "documents").select("doc_id", "text").limit(100)
    // plant clones: doc_id+100000 with one word changed
    val clones = docs.select((col("doc_id") + 100000).as("doc_id"),
      concat(col("text"), lit(" trailing")).as("text"))
    val all = docs.union(clones)
    val found = Dedup.minhashNearDups(all, "doc_id", "text",
      numHashes = 64, bands = 16, threshold = 0.5)
      .filter(col("id_b") === col("id_a") + 100000)
      .count()
    // every clone pair has jaccard ~ n/(n+1) >= 0.9; 16 bands x 4 rows
    // => detection probability per pair ~ 1-(1-0.9^4)^16 ~ 1.0
    assert(found >= 95, s"found only $found of 100 planted near-dup pairs")
  }

  test("window_hashes: positional, non-distinct, empty under k tokens") {
    val df = Seq(
      "Alpha beta  GAMMA alpha beta", // 4 bigram windows, dup window repeats hash
      "alpha beta",                   // exactly one window
      "alpha",                        // shorter than k -> empty
      "").toDF("t")
      .select(Dedup.windowHashes(col("t"), 2).as("wh"))
    val r = df.collect().map(_.getSeq[Long](0))
    assert(r(0).length === 4)
    assert(r(0)(0) === r(0)(3), "same window text must hash equal (case/ws-insensitive)")
    assert(r(0).distinct.length === 3)
    assert(r(1).length === 1)
    assert(r(2).isEmpty && r(3).isEmpty)
    // positional alignment with the distinct kernel's universe
    val sh = Seq("alpha beta gamma alpha beta").toDF("t")
      .select(Dedup.shingleHashes(col("t"), 2).as("s")).collect()(0).getSeq[Long](0)
    assert(r(0).toSet === sh.toSet)
    // blank text has ZERO tokens at every k — at k=1 a naive split would
    // yield Array("") and emit a spurious hash of "" (shared tokenization
    // law with Decontaminate.tokenize and the q73 oracle)
    val k1 = Seq("", "   ", "solo").toDF("t")
      .select(Dedup.windowHashes(col("t"), 1).as("wh"))
      .collect().map(_.getSeq[Long](0))
    assert(k1(0).isEmpty && k1(1).isEmpty, "blank text must yield no 1-windows")
    assert(k1(2).length === 1)
  }

  test("repeatedSpans + strip: planted shared paragraph is found and removed") {
    val boiler = "all rights reserved by the example corporation of somewhere"
    val docs = Seq(
      (1L, s"unique one text here $boiler"),
      (2L, s"$boiler and other words entirely different"),
      (3L, "no shared span in this document at all okay"),
      (4L, null.asInstanceOf[String]),
    ).toDF("doc_id", "text")
    val spans = Dedup.repeatedSpans(docs, "doc_id", "text", k = 5, minDocs = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    // boiler = 9 words -> 5 windows; doc1 offset 4, doc2 offset 0
    assert(spans.map(_._1) === Set(1L, 2L))
    assert(spans.count(_._1 == 1L) === 5 && spans.count(_._1 == 2L) === 5)
    assert(spans.filter(_._1 == 2L).map(_._2) === Set(0, 1, 2, 3, 4))
    val cleaned = Dedup.stripRepeatedSpans(docs, "doc_id", "text", k = 5, minDocs = 2)
      .select("doc_id", "text_clean").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cleaned(1L) === "unique one text here")
    assert(cleaned(2L) === "and other words entirely different")
    assert(cleaned(3L) === "no shared span in this document at all okay")
    assert(cleaned(4L) === null)
    // idempotent: stripping the cleaned corpus finds nothing
    val cleanedDf = Dedup.stripRepeatedSpans(docs, "doc_id", "text", 5, 2)
      .select(col("doc_id"), col("text_clean").as("text"))
    assert(Dedup.repeatedSpans(cleanedDf, "doc_id", "text", 5, 2).isEmpty)
  }

  test("repeatedSpans: within-doc repetition does not count toward minDocs") {
    val docs = Seq(
      (1L, "x y z x y z x y z"), // repeats internally, nowhere else
      (2L, "totally different words here")).toDF("doc_id", "text")
    assert(Dedup.repeatedSpans(docs, "doc_id", "text", k = 3, minDocs = 2).isEmpty)
  }

  test("nearDupClusters: chains close transitively; representatives kept") {
    import spark.implicits._
    // components: {1,2,3,4} as a chain, {10,11}, singleton 20 not in pairs
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id_a", "id_b")
    val labels = Dedup.nearDupClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
    val docs = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L).toDF("doc_id")
    val kept = Dedup.dropNearDupClusters(docs, "doc_id", pairs)
      .as[Long].collect().toSet
    assert(kept === Set(1L, 10L, 20L))
  }

  test("nearDupClusters: long path needs multiple propagation rounds") {
    import spark.implicits._
    // a path 0-1-2-...-12: min label must walk the full diameter
    val pairs = (0L until 12L).map(i => (i + 1, i)).toDF("id_a", "id_b")
    val labels = Dedup.nearDupClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size === 13 && labels.values.forall(_ === 0L))
  }

  test("nearDupClusters: a chain longer than maxIters is LOUD, not mislabeled") {
    import spark.implicits._
    val pairs = (0L until 12L).map(i => (i + 1, i)).toDF("id_a", "id_b")
    // diameter 12 > maxIters 3: the throwing form must refuse to return
    val e = intercept[IllegalArgumentException] {
      Dedup.nearDupClusters(pairs, maxIters = 3)
    }
    assert(e.getMessage.contains("did not converge"))
    // the status form surfaces the flag with partial labels
    val (partial, converged, rounds) =
      Dedup.nearDupClustersWithStatus(pairs, maxIters = 3)
    assert(!converged && rounds === 3)
    assert(partial.count() === 13)
    // and enough rounds converges with the correct labels
    val (full, ok, _) = Dedup.nearDupClustersWithStatus(pairs, maxIters = 25)
    assert(ok)
    assert(full.collect().map(r => r.getLong(1)).forall(_ === 0L))
  }

  test("semDedup: greedy keep-first law against a driver-side recomputation") {
    val e = sf("sf0.001", "embeddings")
    val cents = e.filter(col("vec_id").isin(0L, 3L, 11L, 17L)).orderBy("vec_id")
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toSeq).toIndexedSeq
    val tau = 0.35
    val kept = Dedup.semDedup(e, "vec_id", "embedding", cents, threshold = tau)
      .select("vec_id", "cluster_id")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // independent recomputation: label by argmax dot(unit(v), cent) with
    // ties to the smallest index, then greedy keep-first within cluster
    val rows = e.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n > 0) v.map(_ / n) else v
    }
    def dot(a: Array[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    val labeled = rows.map { case (id, v) =>
      val uv = unit(v)
      val lbl = cents.indices.maxBy(i => (dot(uv, cents(i)), -i))
      (id, lbl, uv)
    }
    val refKept = scala.collection.mutable.Map.empty[Long, Int]
    val dropped = scala.collection.mutable.Set.empty[Long]
    for ((id, lbl, uv) <- labeled) {
      val hasEarlier = labeled.exists { case (id2, lbl2, uv2) =>
        // HALF_UP rounding — the round() convention of the operator
        id2 < id && lbl2 == lbl && BigDecimal(
          uv.zip(uv2).map { case (x, y) => x * y }.sum)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble >= tau
      }
      if (hasEarlier) dropped += id else refKept(id) = lbl
    }
    assert(kept === refKept.toMap)
    assert(dropped.nonEmpty, "sf0.001 embeddings should contain semantic dups")
  }

  test("semDedup keep=low-similarity: farthest-from-centroid survives; " +
      "driver-side recomputation of the precedence law") {
    val e = sf("sf0.001", "embeddings")
    val cents = e.filter(col("vec_id").isin(0L, 3L, 11L, 17L)).orderBy("vec_id")
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toSeq).toIndexedSeq
    val tau = 0.35
    val kept = Dedup.semDedup(e, "vec_id", "embedding", cents, threshold = tau,
        keep = "low-similarity")
      .select("vec_id", "cluster_id")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = e.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n > 0) v.map(_ / n) else v
    }
    def dot(a: Array[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    def r4(x: Double): Double = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val labeled = rows.map { case (id, v) =>
      val uv = unit(v)
      val lbl = cents.indices.maxBy(i => (dot(uv, cents(i)), -i))
      (id, lbl, uv, r4(dot(uv, cents(lbl)))) // rounded precedence key
    }
    val refKept = labeled.filterNot { case (id, lbl, uv, ck) =>
      labeled.exists { case (id2, lbl2, uv2, ck2) =>
        lbl2 == lbl && (ck2 < ck || (ck2 == ck && id2 < id)) &&
          r4(uv.zip(uv2).map { case (x, y) => x * y }.sum) >= tau
      }
    }.map(t => t._1 -> t._2).toMap
    assert(kept === refKept)
    // the policy genuinely differs from keep-first on this corpus
    val keptFirst = Dedup.semDedup(e, "vec_id", "embedding", cents,
        threshold = tau)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept.keySet !== keptFirst,
      "low-similarity keep should pick different representatives here")
    // and per-cluster survivor counts match keep-first: the policy picks
    // WHICH rows survive a pair, the pair graph itself is unchanged only
    // in the greedy sense — so at least totals stay plausible
    assert(kept.nonEmpty && kept.size < rows.length)
  }

  test("semDedup: candidate pairing is cluster-bounded (join on the label)") {
    val e = sf("sf0.001", "embeddings")
    val cents = e.filter(col("vec_id").isin(0L, 3L)).orderBy("vec_id")
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toSeq).toIndexedSeq
    val plan = Dedup.semDedup(e, "vec_id", "embedding", cents, threshold = 0.9)
      .queryExecution.executedPlan.toString
    // the quadratic pruning must be an equi-join on the cluster label —
    // a cartesian/broadcast-nested-loop here would be all-pairs at scale
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"semantic pruning degenerated to all-pairs:\n$plan")
  }

  test("simhash: identical texts equal; near texts within small hamming") {
    val df = Seq(
      ("a", "the quick brown fox jumps over the lazy dog again and again today"),
      ("b", "the quick brown fox jumps over the lazy dog again and again tomorrow"),
      ("c", "completely unrelated words nothing shared here at all zebra")).toDF("id", "t")
      .select(col("id"), Dedup.simhash(col("t")).as("sh"))
    val m = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(m("a"), m("a")) === 0)
    assert(ham(m("a"), m("b")) < ham(m("a"), m("c")),
      s"near ${ham(m("a"), m("b"))} !< far ${ham(m("a"), m("c"))}")
  }
}
