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

  private def manifest(spark: SparkSession, bundleDir: String): String = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(bundleDir), spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new org.apache.hadoop.fs.Path(bundleDir, "manifest.json"))
    val m = new String(in.readAllBytes(), "UTF-8")
    in.close()
    m
  }

  def numShards(spark: SparkSession, bundleDir: String): Int =
    """"numShards":(\d+)""".r.findFirstMatchIn(manifest(spark, bundleDir)) match {
      case Some(m) => m.group(1).toInt
      case None    => throw new IllegalStateException(s"no numShards in $bundleDir/manifest.json")
    }

  /** Bundle format as recorded by the writer ("json" when absent — bundles
    * predating the manifest field). */
  def format(spark: SparkSession, bundleDir: String): String =
    """"format":"(\w+)"""".r.findFirstMatchIn(manifest(spark, bundleDir))
      .map(_.group(1)).getOrElse("json")

  /** Read a bundle; format auto-detected from its manifest unless given. */
  def read(spark: SparkSession, bundleDir: String,
           formatOverride: Option[String] = None): DataFrame = {
    val n = numShards(spark, bundleDir)
    val df = formatOverride.getOrElse(format(spark, bundleDir)) match {
      case "json"    => spark.read
        .schema(graft.streaming.BundleStream.bundleSchema).json(s"$bundleDir/data")
      case "parquet" | "columnar" => spark.read.parquet(s"$bundleDir/data")
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
