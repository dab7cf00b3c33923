package graft

import graft.queries.Queries
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/**
 * Structural plan regression guard against golden_plans/: every query's
 * physical-plan NODE SEQUENCE (operator names from the formatted tree,
 * expression ids stripped) must match the committed snapshot. Catches a
 * silently degraded plan — a lost broadcast, an extra Exchange, a
 * row_number window replacing a WindowGroupLimit — while staying immune to
 * attribute-id and statistics churn. Refresh golden_plans/ intentionally
 * (see its README) when a plan change is deliberate.
 */
class PlanSnapshotSpec extends SparkSpec {

  /** Tree section only, each node reduced to its operator name. */
  private def signature(formatted: String): Seq[String] =
    formatted.linesIterator
      .takeWhile(l => !l.startsWith("(1)")) // details section starts at "(1) "
      .map(_.replaceAll("^[+:\\-\\s|]*", ""))   // tree art
      .filter(_.nonEmpty)
      .filter(_ != "== Physical Plan ==")
      .map(_.replaceAll("\\(\\d+\\)$", "").trim) // trailing node number
      .filter(_.nonEmpty)
      .toSeq

  private val goldenDir = Paths.get("golden_plans")

  /** Plans must be compared under the PRODUCTION session's planning knobs
    * (the snapshots come from Verify, which runs GraftSession) — the test
    * session's smaller broadcast threshold would legitimately flip
    * broadcast joins to SMJ and drown real regressions in config noise. */
  private def withProdPlanningConf[T](f: => T): T = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, s"${64 * 1024 * 1024}")
    try f finally spark.conf.set(key, prev)
  }

  test("every query's physical-plan structure matches its golden snapshot") {
    assume(Files.isDirectory(goldenDir), "golden_plans/ missing")
    val mismatches = scala.collection.mutable.ArrayBuffer.empty[String]
    withProdPlanningConf { for (q <- Queries.all) {
      val goldenFile = goldenDir.resolve(s"${q.name}.txt")
      if (Files.exists(goldenFile)) {
        val golden = signature(Files.readString(goldenFile))
        val current = signature(
          q.build(spark, "/root/testdata/sf0.01").queryExecution
            .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        if (golden != current)
          mismatches += s"${q.name}:\n  golden : ${golden.mkString(" | ")}\n  current: ${current.mkString(" | ")}"
      }
    } }
    assert(mismatches.isEmpty,
      s"${mismatches.size} plan(s) drifted from golden:\n${mismatches.mkString("\n")}")
  }

  test("no query is missing a golden snapshot") {
    assume(Files.isDirectory(goldenDir))
    val have = Files.list(goldenDir).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".txt"))
      .map(_.stripSuffix(".txt")).toSet
    val missing = Queries.all.map(_.name).filterNot(have)
    assert(missing.isEmpty, s"queries without golden plans: $missing " +
      "(run Verify and copy <out>/plans/*.txt into golden_plans/)")
  }
}
