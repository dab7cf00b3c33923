package graft

import org.apache.spark.sql.functions._

/** Diagnostic main for the embedding near-dup stage: replicates the
  * pipeline_full_1m stage shape piece by piece (generate → exact-dedup
  * checkpoint → LSH pairs → anti-join checkpoint) and times each
  * sub-plan, with fixed-knob and auto-knob variants side by side.
  *
  * History (round 12): this probe located the BENCH_r11 dominant stage —
  * fixed 8-bit LSH signatures put ~3.9k rows in every bucket at 1M, so
  * the candidate join did ~15e9 dot products (measured: standalone 305 s,
  * in-pipeline 301 s — the pipeline was innocent; the KNOBS were
  * corpus-size-blind). `autoLshKnobs` sizing (bits→14, tables→25 at 1M,
  * same ≥95% analytic recall at the threshold) took the identical stage
  * to 35-37 s with identical pairs found (50,003 = all 50k plants + 3
  * random). Usage: `runMain graft.BenchNearDupProbe <rows> [auto]`
  * (`auto` skips the slow fixed-knob baselines). */
object BenchNearDupProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    val spark = GraftSession.get("graft-neardup-probe")
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val root = java.nio.file.Files.createTempDirectory("graft-ndprobe").toString
    // the pipeline_full_1m generator, verbatim shape
    val textGen = expr(
      "concat_ws(' ', transform(sequence(1, cast(30 + pmod(xxhash64(b), 40) as int)), " +
        "j -> CASE WHEN pmod(xxhash64(b, j), 2) = 0 " +
        "THEN element_at(array('the','of','and','to','a','in','is','for'), " +
        "cast(pmod(xxhash64(b, j + 100), 8) + 1 as int)) " +
        "ELSE concat('w', pmod(xxhash64(b, j + 200), 5000)) END))")
    val embGen = expr(
      "transform(sequence(1, 32), j -> " +
        "cast(pmod(xxhash64(b, j + 300), 2001) - 1000 as double) / 1000.0)")
    val gen = spark.range(n).select(col("id"),
        when(col("id") >= (n * 95 / 100), col("id") - (n * 95 / 100))
          .when(col("id") >= (n * 90 / 100), col("id") - (n * 90 / 100))
          .otherwise(col("id")).as("b"),
        (col("id") >= (n * 90 / 100) && col("id") < (n * 95 / 100)).as("nd"))
      .select(col("id").as("doc_id"),
        when(col("nd"), concat(textGen, lit(" zzz qqq www")))
          .otherwise(textGen).as("text"),
        embGen.as("embedding"))
    gen.repartition(64).write.parquet(s"$root/in")
    val docs = spark.read.parquet(s"$root/in")

    // "auto" and "sweep" both skip the slow fixed-knob baselines
    val autoOnly = args.length > 1 &&
      (args(1) == "auto" || args(1) == "sweep")
    // (A) standalone: LSH pairs count on the RAW frame (the neardup_1m shape)
    if (!autoOnly) time("A_standalone_pairs_count") {
      graft.ext.Similarity.cosineNearDupsLsh(docs, "doc_id", "embedding",
        threshold = 0.9, dim = 32).count()
    }

    // (B) the pipeline's exact-dedup + checkpoint prefix
    val wNorm = org.apache.spark.sql.expressions.Window
      .partitionBy("_norm").orderBy("doc_id")
    val exact = time("B_exact_checkpoint") {
      docs
        .withColumn("_norm", regexp_replace(lower(trim(col("text"))), "\\s+", " "))
        .withColumn("_rn", row_number().over(wNorm))
        .filter(col("_rn") === 1).drop("_norm", "_rn")
        .localCheckpoint()
    }

    if (!autoOnly) {
      // (C) pairs count on the CHECKPOINTED frame
      val pairs = graft.ext.Similarity.cosineNearDupsLsh(exact, "doc_id",
        "embedding", threshold = 0.9, dim = 32)
      time("C_pairs_count_on_checkpoint") { pairs.count() }
      // (D) the pipeline's actual stage: anti-join + localCheckpoint
      val dropIds = pairs.select(col("id_b").as("doc_id")).distinct()
      time("D_antijoin_checkpoint") {
        exact.join(dropIds, Seq("doc_id"), "left_anti").localCheckpoint().count()
      }
    }
    // (S) targetBucket sweep (arg "sweep"): is the 64-row default optimal
    // at this tier? Analytic per-(row, table) cost = bits·dim (signature)
    // + bucket/2·dim (verify), tables re-bought per bits for the same
    // recall — smaller buckets trade verify dots for more tables (more
    // signature work AND more exploded shuffle rows). The sweep measures
    // where the wall-clock minimum actually sits, with pair-identity
    // asserted across settings.
    if (args.length > 1 && args(1) == "sweep") {
      val nRows = exact.count()
      var basePairs = -1L
      for (tb <- Seq(256L, 128L, 64L, 32L, 16L)) {
        val (tables, bits) = graft.ext.Similarity.autoLshKnobs(
          nRows, threshold = 0.9, targetBucket = tb)
        val cnt = time(f"S_sweep_tb${tb}_t${tables}_b$bits") {
          graft.ext.Similarity.cosineNearDupsLsh(exact, "doc_id",
            "embedding", threshold = 0.9, dim = 32,
            tables = tables, bits = bits).count()
        }
        println(s"PROBE sweep tb=$tb tables=$tables bits=$bits pairs=$cnt")
        if (basePairs < 0) basePairs = cnt
        else if (cnt != basePairs)
          println(s"PROBE sweep PAIR-DRIFT: $cnt vs $basePairs (recall knob)")
      }
    }

    // (E/F) the FIX: auto LSH knobs (bucket-size-targeted bits, recall-
    // preserving tables) on the same checkpointed frame + the full stage
    val pairsAuto = graft.ext.Similarity.cosineNearDupsLsh(exact, "doc_id",
      "embedding", threshold = 0.9, dim = 32, tables = 0, bits = 0)
    val nAuto = time("E_pairs_count_AUTO") { pairsAuto.count() }
    println(s"PROBE pairs auto=$nAuto (plants = n/20)")
    val dropAuto = pairsAuto.select(col("id_b").as("doc_id")).distinct()
    time("F_antijoin_checkpoint_AUTO") {
      exact.join(dropAuto, Seq("doc_id"), "left_anti").localCheckpoint().count()
    }
    println("PROBE done")
    spark.stop()
  }
}
