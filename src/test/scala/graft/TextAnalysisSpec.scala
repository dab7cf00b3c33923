package graft

import graft.ext.TextAnalysis
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("native text_stats equals the HOF reference formulations") {
    val texts = sf("sf0.001", "documents").select("text").limit(150)
      .union(Seq("", " ", "the the the", "a,b.c!d?e;f:g", "Der und DAS  zu").toDF("text"))
    val both = texts.select(
      TextAnalysis.tokenCount(col("text")).as("tc"),
      TextAnalysis.tokenCountHof(col("text")).as("tc_ref"),
      TextAnalysis.punctCount(col("text")).as("pc"),
      TextAnalysis.punctCountHof(col("text")).as("pc_ref"),
      TextAnalysis.langId(col("text")).as("lang"),
      TextAnalysis.langIdHof(col("text")).as("lang_ref"))
    assert(both.filter(col("tc") =!= col("tc_ref") || col("pc") =!= col("pc_ref") ||
      col("lang") =!= col("lang_ref")).count() === 0)
  }

  test("tokenCount / punctCount / ratios") {
    val df = Seq("the cat, the dog!", "").toDF("t").select(
      TextAnalysis.tokenCount(col("t")).as("tc"),
      TextAnalysis.punctCount(col("t")).as("pc"),
      TextAnalysis.stopwordRatio(col("t")).as("sr"))
    val r = df.collect()
    assert(r(0).getInt(0) === 4)
    assert(r(0).getInt(1) === 2) // ',' and '!'
    assert(math.abs(r(0).getDouble(2) - 0.5) < 1e-12) // "the" twice of 4
    assert(r(1).getInt(0) === 1) // "" splits to [""]
  }

  test("langId: votes with list-order tie-break; zero hits -> und") {
    val df = Seq(
      "the cat of the house",   // en
      "el perro de la casa que", // es
      "der hund und die katze",  // de
      "le chien et les chats",   // fr
      "xyzzy plugh",             // none -> und
      "the el",                  // tie en/es -> en (list order)
    ).toDF("t").select(TextAnalysis.langId(col("t")).as("l"))
    assert(df.collect().map(_.getString(0)).toSeq ===
      Seq("en", "es", "de", "fr", "und", "en"))
  }

  test("fingerprint: whitespace/case-insensitive, content-sensitive") {
    val df = Seq("Hello  World", "hello world", "hello worlds").toDF("t")
      .select(TextAnalysis.fingerprint(col("t")).as("f"))
    val f = df.collect().map(_.getLong(0))
    assert(f(0) === f(1))
    assert(f(1) !== f(2))
  }

  test("qualityScore in [0,1] and favors substantial text") {
    val df = Seq(
      "the quick brown fox jumps over the lazy dog and runs to the house of the hill " * 5,
      "!!! ??? ;;; ...").toDF("t")
      .select(TextAnalysis.qualityScore(col("t")).as("q"))
    val q = df.collect().map(_.getDouble(0))
    assert(q.forall(v => v >= 0.0 && v <= 1.0))
    assert(q(0) > q(1))
  }

  test("redactPii: emails, urls, ips, digit runs replaced; clean text untouched") {
    val df = Seq(
      "mail me at jane.doe+x@example.co.uk today",
      "see https://example.com:8080/a?b=1 for details",
      "server at 10.42.0.17 port open",
      "call +1 (415) 555-0173 or 4111 1111 1111 1111 now",
      "nothing sensitive here, just the year 2026").toDF("t")
      .select(TextAnalysis.redactPii(col("t")).as("r"))
    val r = df.collect().map(_.getString(0))
    assert(r(0) === "mail me at <EMAIL> today", r(0))
    assert(r(1) === "see <URL> for details", r(1))
    assert(r(2) === "server at <IP> port open", r(2))
    assert(r(3) === "call +<NUM> or <NUM> now", r(3))
    assert(r(4) === "nothing sensitive here, just the year 2026", r(4))
  }
}
