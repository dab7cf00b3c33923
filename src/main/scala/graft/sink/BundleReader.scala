package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.MetadataBuilder

/**
 * Reads a bundle written by [[BundleSink]] back as a DataFrame, tagging the
 * `_shard` partition column with the bundle's shard count so that
 * [[graft.plans.BundleRoutingPruning]] can turn routing point-lookups into
 * partition-pruned scans.
 */
object BundleReader {

  def numShards(spark: SparkSession, bundleDir: String): Int = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(bundleDir), spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new org.apache.hadoop.fs.Path(bundleDir, "manifest.json"))
    val manifest = new String(in.readAllBytes(), "UTF-8")
    in.close()
    """"numShards":(\d+)""".r.findFirstMatchIn(manifest) match {
      case Some(m) => m.group(1).toInt
      case None    => throw new IllegalStateException(s"no numShards in $bundleDir/manifest.json")
    }
  }

  def read(spark: SparkSession, bundleDir: String, format: String = "json"): DataFrame = {
    val n = numShards(spark, bundleDir)
    val df = format match {
      case "json"    => spark.read
        .schema(graft.streaming.BundleStream.bundleSchema).json(s"$bundleDir/data")
      case "parquet" => spark.read.parquet(s"$bundleDir/data")
      case other     => throw new IllegalArgumentException(s"unsupported bundle format: $other")
    }
    val meta = new MetadataBuilder()
      .putLong(graft.plans.BundleRoutingPruning.NumShardsKey, n.toLong).build()
    graft.plans.GraftExtensions.install(spark)
    df.select(df.columns.map {
      case "_shard" => col("_shard").as("_shard", meta)
      case c        => col(c)
    }.toIndexedSeq: _*)
  }
}
