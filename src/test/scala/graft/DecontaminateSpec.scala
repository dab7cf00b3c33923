package graft

import graft.ext.Decontaminate
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  test("planted contamination: hits count distinct shared n-grams exactly") {
    val bench = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val corpus = Seq(
      // shares "alpha beta" and "beta gamma" (2 distinct bigram hits)
      (10L, "alpha beta gamma nine"),
      // repeats the same shared bigram — distinct semantics count it once
      (11L, "alpha beta zz alpha beta"),
      (12L, "nothing shared here"),
      (13L, null.asInstanceOf[String]),
      (14L, "alpha"), // shorter than n -> 0 total
    ).toDF("doc_id", "text")
    val set = Decontaminate.benchmarkNgrams(bench, "text", n = 2)
    // hashed representation: the distributed (xxhash64) build must agree
    // with the driver-side gram->long law, sorted and 8 bytes per gram
    assert(set.hashes.toSet ===
      Set("alpha beta", "beta gamma", "gamma delta")
        .map(Decontaminate.BenchmarkSet.hashGram))
    assert(set.hashes.toSeq === Decontaminate.BenchmarkSet.fromStrings(
      2, Set("alpha beta", "beta gamma", "gamma delta")).hashes.toSeq)
    assert(set.contains("beta gamma") && !set.contains("beta delta"))
    val r = Decontaminate.tag(corpus, "text", set)
      .select("doc_id", "ngram_hits", "ngram_total")
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r(10L) === ((2L, 3L)))
    assert(r(11L) === ((1L, 3L))) // distinct grams: alpha beta, beta zz, zz alpha
    assert(r(12L) === ((0L, 2L)))
    assert(r(13L) === ((0L, 0L)))
    assert(r(14L) === ((0L, 0L)))
    val kept = Decontaminate.dropContaminated(corpus, "text", set, minHits = 1)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(12L, 13L, 14L))
  }

  test("broadcast tag equals an exploded-join reference formulation") {
    val docs = sf("sf0.001", "documents")
    val set = Decontaminate.benchmarkNgrams(
      docs.filter(col("doc_id") % 100 === 0), "text", n = 3)
    val corpus = docs.filter(col("doc_id") % 100 =!= 0)
    val fast = Decontaminate.tag(corpus, "text", set)
      .select("doc_id", "ngram_hits", "ngram_total")
    // reference: explode distinct per-doc grams, left-join the set as a
    // table, count matches — the shape the oracle uses (bench grams
    // re-derived as STRINGS so the join is string-exact, not hash-based)
    val benchDf = docs.filter(col("doc_id") % 100 === 0)
      .select(explode(Decontaminate.wordNgrams(col("text"), 3)).as("g"))
      .distinct()
    val exploded = corpus.select(col("doc_id"),
        explode_outer(array_distinct(
          Decontaminate.wordNgrams(col("text"), 3))).as("g"))
    val ref = exploded
      .join(benchDf.withColumn("_hit", lit(1L)), Seq("g"), "left")
      .groupBy("doc_id")
      .agg(sum(coalesce(col("_hit"), lit(0L))).as("ngram_hits"),
        sum(when(col("g").isNotNull, 1L).otherwise(0L)).as("ngram_total"))
    assert(fast.exceptAll(ref).count() === 0 && ref.exceptAll(fast).count() === 0)
  }

  test("corpus side is map-only: no exchange in the tag plan") {
    val set = Decontaminate.BenchmarkSet.fromStrings(3, Set("a b c"))
    val plan = Decontaminate.tag(sf("sf0.001", "documents"), "text", set)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"corpus-side shuffle crept in:\n$plan")
  }

  test("benchmarkNgrams enforces the broadcast bound loudly") {
    val bench = Seq.tabulate(40)(i => (i.toLong, s"w$i x$i y$i z$i"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Decontaminate.benchmarkNgrams(bench, "text", n = 2, maxNgrams = 10)
    }
    assert(e.getMessage.contains("distinct"))
  }

  test("bloom scale path: contaminatedIds == exact tag selection") {
    val docs = sf("sf0.001", "documents")
    val bench = docs.filter(col("doc_id") % 50 === 0)
    val corpus = docs.filter(col("doc_id") % 50 =!= 0)
    for (minHits <- Seq(1, 3)) {
      val exact = Decontaminate.tag(corpus, "text",
          Decontaminate.benchmarkNgrams(bench, "text", n = 2))
        .filter(col("ngram_hits") >= minHits)
        .select("doc_id", "ngram_hits", "ngram_total")
      val scalable = Decontaminate.contaminatedIds(corpus, "doc_id", "text",
        bench, "text", n = 2, minHits = minHits)
      assert(scalable.exceptAll(exact).count() === 0 &&
        exact.exceptAll(scalable).count() === 0, s"minHits=$minHits")
    }
  }

  test("bloom scale path: exact even at a pathological fpp (verification " +
      "removes every bloom false positive)") {
    val docs = sf("sf0.001", "documents")
    val bench = docs.filter(col("doc_id") % 50 === 0)
    val corpus = docs.filter(col("doc_id") % 50 =!= 0)
    val exact = Decontaminate.tag(corpus, "text",
        Decontaminate.benchmarkNgrams(bench, "text", n = 2))
      .filter(col("ngram_hits") >= 2)
      .select("doc_id", "ngram_hits", "ngram_total")
    // fpp=0.4: nearly half of clean grams survive the bloom — the exact
    // verify join must still reduce to identical output
    val sloppy = Decontaminate.contaminatedIds(corpus, "doc_id", "text",
      bench, "text", n = 2, minHits = 2, fpp = 0.4)
    assert(sloppy.exceptAll(exact).count() === 0 &&
      exact.exceptAll(sloppy).count() === 0)
  }

  test("dropContaminatedScalable == dropContaminated, via broadcast anti join") {
    val docs = sf("sf0.001", "documents")
    val bench = docs.filter(col("doc_id") % 50 === 0)
    val corpus = docs.filter(col("doc_id") % 50 =!= 0)
    val keptExact = Decontaminate.dropContaminated(corpus, "text",
        Decontaminate.benchmarkNgrams(bench, "text", n = 2), minHits = 1)
      .select("doc_id")
    val kept = Decontaminate.dropContaminatedScalable(corpus, "doc_id", "text",
      bench, "text", n = 2, minHits = 1)
    assert(kept.columns.toSeq === corpus.columns.toSeq)
    assert(kept.select("doc_id").exceptAll(keptExact).count() === 0 &&
      keptExact.exceptAll(kept.select("doc_id")).count() === 0)
    val plan = kept.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"flagged set must broadcast into the anti join:\n$plan")
  }
}
