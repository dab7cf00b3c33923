package graft

import org.apache.spark.sql.functions._

/** Focused A/B micro-bench for optimization rounds: times ONE named
  * operation N times in a single JVM (rep 1 absorbs JIT/codegen warmup;
  * report the median of the rest). Run the before-jar and after-jar
  * interleaved on an idle box to beat the documented 2–4x day-to-day
  * swing of the 1M tier. NOT part of the driver bench contract —
  * `graft.Bench` remains the official entry point.
  *
  * Usage: BenchAB <op> [reps]   op: postings1m | postings1m_nopos |
  *        neardup1m | neardup1m_sparse | q26 | suiteq <name>
  */
object BenchAB {
  def main(args: Array[String]): Unit = {
    val op = args.headOption.getOrElse("postings1m")
    val reps = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = GraftSession.get("graft-bench-ab")
    spark.sparkContext.setLogLevel("ERROR")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def rmrf(path: String): Unit = {
      import java.nio.file.{Files, Paths, Path}
      if (Files.exists(Paths.get(path))) {
        import scala.jdk.CollectionConverters._
        Files.walk(Paths.get(path))
          .sorted(java.util.Comparator.reverseOrder[Path]())
          .iterator().asScala.foreach(p => Files.deleteIfExists(p))
      }
    }

    // the bm25_index_1m corpus, verbatim
    def bm25Docs = spark.range(1000000L).select(col("id").as("doc_id"),
      expr("""array_join(transform(
                sequence(1, cast(50 + pmod(xxhash64(id), 100) as int)),
                i -> concat('w', pmod(xxhash64(id, i), 100))), ' ')""")
        .as("text")).repartition(64).cache()

    // the neardup_1m corpus, verbatim (planted near-pairs)
    def neardupDocs(planted: Int) = {
      val base = spark.range(1000000L).select(col("id").as("doc_id"),
        expr("""array_join(transform(
                  sequence(1, 40),
                  i -> concat('t', pmod(xxhash64(id, i), 200000))), ' ')""")
          .as("text"))
      base.cache()
    }

    val secs = op match {
      case "postings1m" | "postings1m_nopos" =>
        val docs = bm25Docs; docs.count()
        val positional = op == "postings1m"
        val out = (1 to reps).map { _ =>
          val dir = java.nio.file.Files.createTempDirectory("graft-ab-idx").toString
          val s = time {
            graft.ext.Search.buildPostingsIndex(docs, "doc_id", "text", dir,
              buckets = 64, positional = positional)
          }
          rmrf(dir); s
        }
        docs.unpersist(); out
      case "neardup1m" =>
        // pipeline-shaped corpus: 40-token docs, ids with pmod(id,20)<2
        // form planted near-pairs (share 40 tokens, differ in 1 → jaccard
        // 40/42 ≈ 0.95), everything else unique — ~10% of docs are
        // verify-join candidates, the regime the semi-prefilter targets
        val docs = spark.range(1000000L).select(col("id").as("doc_id"),
          expr("""concat(array_join(transform(
                    sequence(1, 40),
                    i -> concat('t', pmod(xxhash64(
                      cast(case when pmod(id, 20) < 2
                           then id - pmod(id, 20) else id end as long), i),
                      2000000))), ' '), ' u', id)""")
            .as("text")).repartition(64).cache()
        docs.count()
        (1 to reps).map { _ =>
          time {
            graft.ext.Dedup.minhashNearDups(docs, "doc_id", "text",
                threshold = 0.9)
              .write.mode("overwrite").format("noop").save()
          }
        }
      case "q26" =>
        (1 to reps).map { _ =>
          time {
            graft.queries.Queries.all.find(_.name == "q26_minhash_neardup").get
              .build(spark, "/root/testdata/sf0.1")
              .write.mode("overwrite").format("noop").save()
          }
        }
      case "postings_plan" =>
        // evidence capture: the postings-build plan (formatted), for
        // plans/r16/ — run with the before-jar first on the classpath to
        // print the pre-O1 plan, with the after-jar alone for the new one
        val docs = bm25Docs
        println(graft.ext.Search.postings(docs, "doc_id", "text", 64)
          .queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        docs.unpersist()
        Seq(0.0)
      case other =>
        // any suite query by name at sf0.1
        val q = graft.queries.Queries.all.find(_.name == other)
          .getOrElse(sys.error(s"unknown op/query $other"))
        (1 to reps).map { _ =>
          time {
            q.build(spark, "/root/testdata/sf0.1")
              .write.mode("overwrite").format("noop").save()
          }
        }
    }
    val sorted = secs.drop(1).sorted
    val med = if (sorted.nonEmpty) sorted(sorted.size / 2) else secs.head
    println(f"AB $op reps=$reps secs=${secs.map(s => f"$s%.2f").mkString(",")} " +
      f"median_after_warm=$med%.3f")
    graft.queries.Queries.sweepScratch()
    spark.stop()
  }
}
