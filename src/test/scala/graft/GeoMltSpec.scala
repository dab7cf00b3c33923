package graft

import graft.ext.Search
import org.apache.spark.sql.functions._

/** Round-15 surface: regexp query, dis_max tie_breaker, geo_bounding_box /
  * geo_polygon / geohash_grid, ES percentiles aggregation, more_like_this.
  * Each law pins either scan==index bit-identity, an independent
  * recomputation, or a published reference value. */
class GeoMltSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-geomlt-$tag").toString

  // ---------- regexp ----------

  test("regexpTopK == indexedRegexpTopK (maxExpansions 0), incl. a " +
    "prefixless pattern that must drop the dictionary prefilter") {
    val docs = sf("sf0.001", "documents")
    val idx = tmpDir("regexpidx")
    Search.buildPostingsIndex(docs, "doc_id", "text", idx, buckets = 8)
    // the alternation patterns are the r15-ADVICE regression: a top-level
    // '|' must void the dictionary prefilter (a "cat" prefix would drop
    // every "dog"-branch term), while a grouped one keeps its prefix
    for (q <- Seq("sp[aeiou]rk", "[a-z]*indow sp[aeiou]rk", "wind[a-z]+",
                  "spark|window", "wind(ow|y)")) {
      val scan = Search.regexpTopK(docs, "doc_id", "text", q, k = 25)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
      val indexed = Search.indexedRegexpTopK(spark, idx, q, k = 25,
        maxExpansions = 0)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
      assert(scan === indexed, s"scan != index for '$q'")
      assert(scan.nonEmpty, s"'$q' should match by construction")
    }
  }

  test("regexpTopK whole-token anchoring: a mid-token match does not count") {
    val docs = Seq((1L, "sparkling water"), (2L, "spark core"),
      (3L, "the spork")).toDF("doc_id", "text")
    val got = Search.regexpTopK(docs, "doc_id", "text", "sp[aeiou]rk", k = 10)
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(2L, 3L)) // "sparkling" must NOT match the anchored form
  }

  test("regexLiteralPrefix: meta-free prefix only; empty for leading meta") {
    assert(Search.regexLiteralPrefix("wind[a-z]+") === "wind")
    assert(Search.regexLiteralPrefix("[a-z]*indow") === "")
    assert(Search.regexLiteralPrefix("plain") === "plain")
    assert(Search.regexLiteralPrefix("a\\d+") === "a")
  }

  test("regexLiteralPrefix: top-level alternation voids the prefix; " +
    "grouped/class/escaped '|' does not") {
    assert(Search.regexLiteralPrefix("cat|dog") === "")      // right branch free
    assert(Search.regexLiteralPrefix("cat|dog|cow") === "")
    assert(Search.regexLiteralPrefix("ab\\|cd") === "ab")    // escaped: literal
    assert(Search.regexLiteralPrefix("wind(ow|y)") === "wind") // grouped: sound
    assert(Search.regexLiteralPrefix("a[|]b") === "a")       // class: literal
    assert(Search.regexLiteralPrefix("(cat|dog)s") === "")   // leading meta
  }

  // ---------- dis_max tie_breaker ----------

  test("multiFieldTopK tie_breaker: tb=0 is bit-identical to plain " +
    "best_fields; tb=1 equals most_fields ranking-wise; tb=0.3 matches " +
    "the max + tb*(sum-max) law; indexed path agrees bit-for-bit") {
    val docs = sf("sf0.001", "documents")
      .withColumn("meta", concat_ws(" ", col("source"), col("lang")))
    val q = "spark en src3"
    def run(mode: String, tb: Double) =
      Search.multiFieldTopK(docs, "doc_id",
        Seq(("text", 1.0), ("meta", 0.5)), q, k = 30, mode = mode,
        tieBreaker = tb)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
    assert(run("best_fields", 0.0) ===
      Search.multiFieldTopK(docs, "doc_id",
        Seq(("text", 1.0), ("meta", 0.5)), q, k = 30, mode = "best_fields")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq)
    // tb = 1: max + (sum - max) == sum -> same RANKING as most_fields
    // (scores can differ in the last ulp: different float sequence)
    assert(run("best_fields", 1.0).map(_._1) ===
      run("most_fields", 0.0).map(_._1))
    // tb = 0.3 against an independent per-doc recomputation
    val idx1 = tmpDir("dmx1"); val idx2 = tmpDir("dmx2")
    Search.buildPostingsIndex(docs, "doc_id", "text", idx1, buckets = 8)
    Search.buildPostingsIndex(docs, "doc_id", "meta", idx2, buckets = 8)
    val scan = run("best_fields", 0.3)
    val indexed = Search.indexedMultiFieldTopK(spark,
      Seq((idx1, 1.0), (idx2, 0.5)), q, k = 30, mode = "best_fields",
      tieBreaker = 0.3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
    assert(scan === indexed)
    // law check on one doc: recompute from the per-field single-field runs
    val f1 = Search.multiFieldTopK(docs, "doc_id", Seq(("text", 1.0)), q,
      k = 1000, roundTo = 12).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val f2 = Search.multiFieldTopK(docs, "doc_id", Seq(("meta", 0.5)), q,
      k = 1000, roundTo = 12).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    scan.foreach { case (id, _, s) =>
      val a = f1.getOrElse(id, 0.0); val b = f2.getOrElse(id, 0.0)
      // the published score rounds to 4; compare at the same grain
      val want = math.rint(
        (math.max(a, b) + 0.3 * ((a + b) - math.max(a, b))) * 1e4) / 1e4
      assert(math.abs(s - want) < 1e-9, s"doc $id: $s vs $want")
    }
  }

  test("tie_breaker guards: range-checked, best_fields-only") {
    val docs = Seq((1L, "a", "b")).toDF("doc_id", "text", "meta")
    intercept[IllegalArgumentException] {
      Search.multiFieldTopK(docs, "doc_id", Seq(("text", 1.0)), "a", 5,
        mode = "best_fields", tieBreaker = 1.5)
    }
    intercept[IllegalArgumentException] {
      Search.multiFieldTopK(docs, "doc_id", Seq(("text", 1.0)), "a", 5,
        mode = "most_fields", tieBreaker = 0.3)
    }
  }

  // ---------- geo ----------

  test("geoBoundingBox: inclusive edges; antimeridian box is the OR of " +
    "two half-intervals") {
    val pts = Seq(
      (1L, 0.0, 170.0), (2L, 0.0, -170.0), (3L, 0.0, 0.0),
      (4L, 40.0, 160.0), (5L, 41.0, 160.0), (6L, -10.0, -160.0),
      (7L, -10.1, -160.0)).toDF("id", "lat", "lon")
    val got = Search.geoBoundingBox(pts, "id", "lat", "lon",
      top = 40.0, left = 150.0, bottom = -10.0, right = -160.0)
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 2L, 4L, 6L)) // 3 outside lon, 5 above top, 7 below bottom
    // non-crossing box sanity
    val plain = Search.geoBoundingBox(pts, "id", "lat", "lon",
      top = 1.0, left = -1.0, bottom = -1.0, right = 1.0)
      .collect().map(_.getLong(0)).toSet
    assert(plain === Set(3L))
  }

  test("geoPolygon: even-odd raycast agrees with a brute per-point check " +
    "on a non-convex polygon") {
    // non-convex "arrow": (0,0) (4,2) (0,4) (2,2) — concave at (2,2)
    val poly = Seq((0.0, 0.0), (4.0, 2.0), (0.0, 4.0), (2.0, 2.0))
    def brute(lat: Double, lon: Double): Boolean = {
      var inside = false
      var i = 0
      while (i < poly.length) {
        val (yi, xi) = poly(i)
        val (yj, xj) = poly((i + 1) % poly.length)
        if (((yi > lat) != (yj > lat)) &&
          lon < (xj - xi) * (lat - yi) / (yj - yi) + xi) inside = !inside
        i += 1
      }
      inside
    }
    val grid = for (a <- -10 to 50; b <- -10 to 50)
      yield (a.toLong * 1000 + b, a / 10.0, b / 10.0)
    val pts = grid.toDF("id", "lat", "lon")
    val got = Search.geoPolygon(pts, "id", "lat", "lon", poly)
      .collect().map(_.getLong(0)).toSet
    val want = grid.filter { case (_, la, lo) => brute(la, lo) }
      .map(_._1).toSet
    assert(got === want)
    assert(want.nonEmpty && want.size < grid.size)
  }

  test("geoShapeEnvelope: relation algebra on a hand fixture; disjoint is " +
      "the exact complement of intersects; bad inputs refuse") {
    // query envelope: lat [-10, 30], lon [0, 40]
    val boxes = Seq(
      (1L,   0.0, 10.0,  5.0, 15.0),  // strictly inside -> within
      (2L, -20.0, 40.0, -5.0, 50.0),  // strictly covers -> contains
      (3L,  25.0, 35.0, 35.0, 45.0),  // corner overlap  -> intersects
      (4L,  50.0, 60.0, 90.0, 99.0),  // far away        -> disjoint
      (5L, -10.0, 30.0,  0.0, 40.0),  // EXACT match: within AND contains
      (6L,  30.0, 31.0, 40.0, 41.0))  // touches the corner point: inclusive
      .toDF("doc_id", "lat_min", "lat_max", "lon_min", "lon_max")
    def rel(r: String): Set[Long] =
      graft.ext.Search.geoShapeEnvelope(boxes, "doc_id", "lat_min",
        "lat_max", "lon_min", "lon_max", top = 30.0, left = 0.0,
        bottom = -10.0, right = 40.0, relation = r)
        .collect().map(_.getLong(0)).toSet
    assert(rel("intersects") === Set(1L, 2L, 3L, 5L, 6L))
    assert(rel("within") === Set(1L, 5L))
    assert(rel("contains") === Set(2L, 5L))
    assert(rel("disjoint") === Set(4L))
    // disjoint == complement of intersects, always
    assert((rel("intersects") ++ rel("disjoint")) ===
      (1L to 6L).toSet)
    intercept[IllegalArgumentException] {
      graft.ext.Search.geoShapeEnvelope(boxes, "doc_id", "lat_min",
        "lat_max", "lon_min", "lon_max", 30.0, 100.0, -10.0, -100.0)
    } // antimeridian-crossing query envelope refused in the subset
    intercept[IllegalArgumentException] {
      graft.ext.Search.geoShapeEnvelope(boxes, "doc_id", "lat_min",
        "lat_max", "lon_min", "lon_max", 30.0, 0.0, -10.0, 40.0,
        relation = "overlaps")
    }
  }

  test("geohash matches published reference values and clamps the edges") {
    val pts = Seq(
      (1L, 57.64911, 10.40744), // canonical: u4pruydqqvj
      (2L, 90.0, 180.0),        // top corner clamps into the last cell
      (3L, -90.0, -180.0),      // bottom corner: all-zero bits
      (4L, 0.0, 0.0)            // s000... (origin)
    ).toDF("id", "lat", "lon")
    def gh(p: Int): Map[Long, String] = pts
      .select(col("id"), Search.geohash(col("lat"), col("lon"), p).as("g"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(gh(1)(1L) === "u")
    assert(gh(4)(1L) === "u4pr")
    assert(gh(11)(1L) === "u4pruydqqvj")
    assert(gh(3)(3L) === "000")
    assert(gh(3)(2L) === "zzz")
    assert(gh(1)(4L) === "s")
  }

  test("geohashGridFacet: exact counts per cell, ES tie-break " +
    "(docs desc, geohash asc), no corpus-sized window in the plan") {
    val pts = (0 until 1000).map { i =>
      val lat = (i * 17) % 18000 / 100.0 - 90.0
      val lon = (i * 31) % 36000 / 100.0 - 180.0
      (lat, lon)
    }.toDF("lat", "lon")
    val got = Search.geohashGridFacet(pts, "lat", "lon", precision = 2,
      topN = 5).collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    // independent recount via the geohash column itself
    val counts = pts.select(Search.geohash(col("lat"), col("lon"), 2).as("g"))
      .groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val want = counts.sortBy { case (g, n) => (-n, g) }.take(5)
    assert(got.map(x => (x._1, x._2)).toSeq === want.toSeq)
    assert(got.map(_._3).toSeq === (1 to got.length))
    val plan = Search.geohashGridFacet(pts, "lat", "lon", 2, 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window in facet plan:\n$plan")
  }

  test("haversineKm: near-antipodal radicand clamps (no NaN)") {
    val d = Seq((1L)).toDF("id")
      .select(Search.haversineKm(lit(0.0), lit(0.0), lit(0.0), lit(180.0))
        .as("d")).head().getDouble(0)
    assert(!d.isNaN && math.abs(d - math.Pi * 6371.0088) < 1.0)
  }

  // ---------- percentiles ----------

  test("percentilesFacet: exact form matches a driver-side interpolation; " +
    "approx form lands within rank tolerance") {
    val docs = sf("sf0.001", "documents")
    val pct = Seq(25.0, 50.0, 95.0)
    val got = Search.percentilesFacet(docs, "text", "spark window",
      "n_chars", pct).collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val matched = docs.filter(
      array_contains(Search.tokens(col("text")), "spark") ||
      array_contains(Search.tokens(col("text")), "window"))
      .select(col("n_chars").cast("double")).as[Double].collect().sorted
    def interp(p: Double): Double = {
      val r = p / 100.0 * (matched.length - 1)
      val lo = math.floor(r).toInt; val hi = math.ceil(r).toInt
      val g = r - lo
      matched(lo) * (1 - g) + matched(hi) * g
    }
    pct.foreach { p =>
      assert(math.abs(got(p) - interp(p)) < 1e-4, s"p$p: ${got(p)} vs ${interp(p)}")
    }
    // approx twin: within a small rank neighborhood of the exact value
    val approx = Search.percentilesFacet(docs, "text", "spark window",
      "n_chars", pct, approximate = true).collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    pct.foreach { p =>
      val exactRank = p / 100.0 * (matched.length - 1)
      val nearby = matched.slice(
        math.max(0, exactRank.toInt - 3),
        math.min(matched.length, exactRank.toInt + 4))
      assert(approx(p) >= nearby.min - 1 && approx(p) <= nearby.max + 1,
        s"approx p$p=${approx(p)} far from exact neighborhood $nearby")
    }
  }

  // ---------- more_like_this ----------

  test("moreLikeThisTopK: selection respects min_term_freq/min_doc_freq/" +
    "max_query_terms; the like doc is excluded but counted in stats") {
    // crafted corpus: doc 1 repeats "apple banana"; "apple" is common
    // (df 6 >= 5), "banana" is rare (df 2 < 5 -> filtered), "cherry"
    // appears once in doc 1 (tf 1 < 2 -> filtered)
    val docs = (Seq(
      (1L, "apple apple banana banana cherry"),
      (2L, "apple pie"), (3L, "apple tart"), (4L, "apple cake"),
      (5L, "apple juice"), (6L, "apple banana split"),
      (7L, "grape soda")
    )).toDF("doc_id", "text")
    val got = Search.moreLikeThisTopK(docs, "doc_id", "text", likeId = 1L,
      k = 10, minTermFreq = 2, minDocFreq = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    // selected terms must be exactly {apple}: docs 2..6 match, 7 doesn't,
    // 1 is excluded
    assert(got.map(_._1).toSet === Set(2L, 3L, 4L, 5L, 6L))
    assert(got.map(_._2).toSeq === (1 to 5))
    // stats included doc 1: df(apple) = 6 of N = 7. Compare one score.
    val idf = math.log(1.0 + (7 - 6 + 0.5) / (6 + 0.5))
    val avgdl = docs.select(sum(size(Search.tokens(col("text")))))
      .head().getLong(0).toDouble / 7
    val dl2 = 2.0
    val want2 = idf * (1.0 * 2.2) / (1.0 + 1.2 * (0.25 + 0.75 * dl2 / avgdl))
    val got2 = got.find(_._1 == 2L).get._3
    assert(math.abs(got2 - math.rint(want2 * 1e4) / 1e4) < 1e-9)
  }

  test("moreLikeThisTextTopK == indexedMoreLikeThisTopK on a fresh build " +
    "(scan==index), over the real corpus") {
    val docs = sf("sf0.001", "documents")
    val likeText = docs.filter(col("doc_id") === 7L)
      .select(col("text")).head().getString(0)
    val idx = tmpDir("mltidx")
    Search.buildPostingsIndex(docs, "doc_id", "text", idx, buckets = 8)
    val scan = Search.moreLikeThisTextTopK(docs, "doc_id", "text",
      likeText, k = 20, minDocFreq = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
    val indexed = Search.indexedMoreLikeThisTopK(spark, idx, likeText,
      k = 20, minDocFreq = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
    assert(scan === indexed)
    assert(scan.nonEmpty)
  }

  test("moreLikeThisTopK: unknown like id refuses loudly") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Search.moreLikeThisTopK(docs, "doc_id", "text", likeId = 99L, k = 5)
    }
  }
}
