package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** Queries whose runtime (post-AQE) plan is worth snapshotting: the ones
    * with real exchanges where coalesce/skew handling can change shape. */
  private val AqeFinalPlanQueries = Set(
    "q02_agg", "q03_join_agg", "q26_minhash_neardup", "q35_skew_join",
    "q56_pipeline")

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg (local iteration only — the driver passes 2): a
    // comma-separated query-name filter, e.g. "q116,q117"
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").map(_.trim).toSet)
      else None
    def selected(name: String): Boolean =
      only.forall(f => f.exists(name.startsWith))
    // same tuned engine config as every other entry point; the historical
    // default here is 4 cpus unless the driver overrides
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder("graft-verify")
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // clean slate: the driver globs EVERY subdir of outDir as a query
    // result, and it reuses the same outDir across rounds — stale content
    // (round 1 wrote plans/ + timings.json here) must not survive
    locally {
      val root = new java.io.File(outDir)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      if (root.exists()) rm(root)
    }
    new java.io.File(outDir).mkdirs()
    // plans + timings live in a SIBLING directory: the driver globs outDir
    // for query results and would otherwise read plans/ as a query named
    // "plans" (round-1 spurious row)
    val metaDir = new java.io.File(outDir).getAbsoluteFile.getParent + "/verify_meta"
    new java.io.File(s"$metaDir/plans").mkdirs()
    // per-query wall time + the formatted physical plan ride along with the
    // correctness dump (regression triage: a query that got slow or lost its
    // pushdown/broadcast shows up right next to its hash mismatch)
    val timings = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    SparkEntry.queries.filter(kv => selected(kv._1)).foreach { case (name, fn) =>
      try {
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        timings += name -> (System.nanoTime() - t0) / 1e9
        try Files.writeString(Paths.get(s"$metaDir/plans/$name.txt"),
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        catch { case _: Throwable => () } // plan dump is best-effort
        // final ADAPTIVE plans for the shuffle-heavy queries: execute this
        // QueryExecution directly so AQE finalizes it (isFinalPlan=true,
        // runtime coalesce/skew decisions visible), then snapshot
        if (AqeFinalPlanQueries(name)) {
          try {
            val fresh = fn(spark, sfDir)
            fresh.queryExecution.toRdd.foreach(_ => ())
            Files.writeString(Paths.get(s"$metaDir/plans/$name.final.txt"),
              fresh.queryExecution.executedPlan.toString)
          } catch { case _: Throwable => () }
        }
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    Files.writeString(Paths.get(s"$metaDir/timings.json"),
      timings.sortBy(_._1).map { case (n, s) => s""""$n":${f"$s%.3f"}""" }
        .mkString("{", ",", "}"))
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // {SFDIR} placeholders make oracles self-contained for tables the
    // harness may not have registered as views (documents/embeddings)
    val json = SparkEntry.oracleSql
      .filter(kv => selected(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v.replace("{SFDIR}", sfDir))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // sweep the in-query index scratch (q70/q90/q97/... lifecycles):
    // 21 per-run dirs otherwise accumulate in /tmp across runs
    graft.queries.Queries.sweepScratch()
    spark.stop()
  }
}
