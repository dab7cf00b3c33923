package graft.streaming


/**
 * Bundle-consumer daemon (the Spark-native analog of the reference's
 * server-side incremental HDFS consumer, SURVEY.md §3.3/§2.10):
 *
 *   graft.streaming.ConsumeMain <bundleDir> <checkpointDir> [--follow]
 *
 * Default drains everything currently in the bundle (Trigger.AvailableNow —
 * the drain-and-stop completion semantics); `--follow` keeps polling every
 * 10 s like the reference's sleep loop.
 */
object ConsumeMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ConsumeMain <bundleDir> <checkpointDir> [--follow]")
    val Array(bundleDir, ckpt) = args.take(2)
    val follow = args.contains("--follow")
    val spark = graft.GraftSession.get("graft-bundle-consumer")
    try {
      val q = BundleStream.consolidate(
        BundleStream.read(spark, bundleDir), ckpt, availableNow = !follow)
      if (follow) q.awaitTermination()
      else { q.awaitTermination(600000) }
      val progress = spark.table("bundle_progress").collect()
        .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
      println(s"consumed ${progress.map(_._2).sum} docs from $bundleDir")
      progress.foreach { case (s, n) => println(s"  shard $s: $n docs") }
    } finally spark.stop()
  }
}
