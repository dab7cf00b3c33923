package graft

import graft.queries.Queries
import graft.sink.BundleSink
import graft.transform.DocTransform

/**
 * Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and the
 * end-to-end bundle pipeline, printing ONE JSON line. Queries are fully
 * materialized through the noop sink (count() would let Catalyst skip
 * computing projected columns, understating work).
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-bench")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime()
      try f catch { case e: Throwable =>
        System.err.println(s"[bench] failed: ${e.getMessage}"); return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    // warmup: JIT + codegen + parquet footer caches, so the first measured
    // query isn't charged the whole session's startup cost
    time {
      spark.range(1000000).selectExpr("sum(id)").write.mode("overwrite").format("noop").save()
      Tables.load(spark, sfDir, "lineitem").limit(10000)
        .write.mode("overwrite").format("noop").save()
    }

    val results = Queries.all.map { q =>
      q.name -> time {
        q.build(spark, sfDir).write.mode("overwrite").format("noop").save()
      }
    }

    // end-to-end sink pipeline (scan -> docs -> es_shard -> bundle write),
    // measured for both bundle formats
    val sinkDir = java.nio.file.Files.createTempDirectory("graft-bench-sink").toString
    def sinkDocsDf = DocTransform.docs(Tables.load(spark, sfDir, "lineitem")
      .withColumn("li_id", org.apache.spark.sql.functions.concat_ws("-",
        org.apache.spark.sql.functions.col("l_orderkey"),
        org.apache.spark.sql.functions.col("l_linenumber"))), "li_id", None)
    var sinkDocs = 0L
    val sinkSec = time {
      sinkDocs = BundleSink.write(sinkDocsDf, s"$sinkDir/bench_idx", numShards = 8,
        partitionMultiples = 4, repartition = true).totalDocs
    }
    val sinkParquetSec = time {
      BundleSink.write(sinkDocsDf, s"$sinkDir/bench_idx_pq", numShards = 8,
        partitionMultiples = 4, repartition = true, format = "parquet")
    }

    val all = results :+ ("sink_bundle" -> sinkSec) :+ ("sink_bundle_parquet" -> sinkParquetSec)
    val qs = all.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = all.map(_._2).filter(_ >= 0).sum
    val docsPerSec = if (sinkSec > 0) (sinkDocs / sinkSec).round else -1
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sink_docs_per_sec":$docsPerSec,"sf":"$sfDir"}""")
    spark.stop()
  }
}
