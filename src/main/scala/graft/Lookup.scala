package graft

import graft.sink.BundleReader
import org.apache.spark.sql.functions._

/**
 * Routed point lookup over a bundle — the ES `?routing=k` search analog:
 *
 *   graft.Lookup <bundleDir> <routingKey>
 *
 * Uses [[graft.plans.BundleRoutingPruning]] so only the one shard directory
 * implied by the routing hash is scanned.
 */
object Lookup {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: Lookup <bundleDir> <routingKey>")
    val Array(dir, key) = args
    val spark = GraftSession.get("graft-lookup")
    try {
      val df = BundleReader.read(spark, dir).filter(col("_routing") === key)
      val plan = df.queryExecution.executedPlan.toString
      val pruned = "PartitionFilters: \\[[^\\]]*_shard[^\\]]*\\]".r.findFirstIn(plan)
      println(s"partition pruning: ${pruned.getOrElse("NONE (full scan!)")}")
      val rows = df.collect()
      println(s"${rows.length} docs for routing '$key' " +
        s"(shard ${graft.functions.EsMurmur3.shard(key, BundleReader.numShards(spark, dir))})")
      rows.take(5).foreach { r =>
        // json bundles carry one doc string; columnar bundles carry typed
        // fields — show whatever this bundle has
        val body =
          if (df.columns.contains("doc")) Option(r.getAs[String]("doc")).getOrElse("").take(80)
          else df.columns.filterNot(Set("_id", "_routing", "_shard"))
            .take(4).map(c => s"$c=${r.getAs[Any](c)}").mkString(" ")
        println(s"  _id=${r.getAs[String]("_id")} $body")
      }
    } finally spark.stop()
  }
}
