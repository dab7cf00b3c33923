package graft.sink

import graft.functions.EsFunctions
import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/**
 * Shard-addressed bundle sink (SURVEY.md S5-S9 semantics, Spark-first).
 *
 * The reference routes each doc to its ES shard with a custom murmur3
 * partitioner, builds a Lucene index per partition inside an embedded ES
 * node, zips it and uploads to `{workDir}/{index}/{shardId}/p{partition}.zip`
 * (`ESHashPartitioner.scala:10-29`, `ESContainer.scala:251-285`). Here the
 * same placement contract is a `_shard` column + one hash exchange + a
 * partitioned file write:
 *
 *   out/{index}/_shard={k}/part-*.{json.gz|parquet}   + manifest.json
 *
 * Correctness does not depend on Spark's exchange at all: files are
 * bucketed by the `_shard` COLUMN VALUE via partitionBy, so two shards
 * hashing into one Spark partition (or AQE coalescing) is harmless
 * (SURVEY.md §7.5 "exchange collisions"). The repartition only controls
 * file count/locality: numShards × multiples tasks, mirroring the
 * reference's fan-out (`Hive2ES.scala:43`).
 *
 * Commit protocol: Spark's file committer gives temp+rename atomicity
 * (parity with `CompressionUtils.java:61-82`); `_STARTED`/`manifest.json`
 * mirror the reference's started/completed ZK states
 * (`ServerNotifier.scala:21-50`).
 */
object BundleSink {

  case class Result(outDir: String, numShards: Int, totalDocs: Long,
                    shardCounts: Map[Int, Long])

  /**
   * Multi-index sink: ONE scan feeds every index. The reference runs a full
   * Spark job per index (`Hive2ES.main` once per invocation); when N
   * indices derive from the same source — the common "route rows by
   * category/date into per-tenant indices" layout — that reads the source
   * N times. Here an `_index` column routes each doc, one exchange fans out
   * on (index, routing), and one partitioned write lands
   * `out/{index}/data/_shard=k/` for all indices — the source is read once
   * regardless of N. Per-index manifests are derived from a single
   * read-back count pass over the (much smaller) output.
   */
  def writeMulti(docs: DataFrame, outRoot: String, indexCol: String,
                 numShards: Int, partitionMultiples: Int = 10,
                 repartition: Boolean = true, format: String = "json",
                 typeName: String = "doc",
                 compression: Option[String] = None,
                 mappingJson: Option[String] = None): Map[String, Result] = {
    val spark = docs.sparkSession
    val sharded = docs
      .withColumn("_index", col(indexCol))
      .withColumn("_shard", EsFunctions.es_shard(col("_routing"), numShards))
    val arranged =
      if (repartition) sharded.repartition(numShards * partitionMultiples,
        col("_index"), EsFunctions.es_partition(col("_routing"), numShards, partitionMultiples))
      else sharded
    val writer = arranged.drop(indexCol).write.mode("overwrite")
      .partitionBy("_index", "_shard")
    val codec = format match {
      case "json"    => compression.getOrElse("gzip")
      case "parquet" => compression.getOrElse("zstd")
      case other => throw new IllegalArgumentException(s"unsupported multi-bundle format: $other")
    }
    val dataDir = s"$outRoot/data"
    format match {
      case "json"    => writer.option("compression", codec).json(dataDir)
      case "parquet" => writer.option("compression", codec).parquet(dataDir)
    }
    // one read-back pass for all manifests (columnar-prunable when parquet)
    val back = format match {
      case "json" => spark.read
        .schema(graft.streaming.BundleStream.bundleSchema).json(dataDir)
      case _ => spark.read.parquet(dataDir)
    }
    val counts = back.groupBy(col("_index"), col("_shard"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(outRoot), spark.sparkContext.hadoopConfiguration)
    counts.keys.map(_._1).toSet.map { (idx: String) =>
      val perShard = (0 until numShards)
        .map(sh => sh -> counts.getOrElse((idx, sh), 0L)).toMap
      val total = perShard.values.sum
      val manifest =
        s"""{"indexName":"$idx","typeName":"$typeName","workDir":"$outRoot/data/_index=$idx",
           |"numShards":$numShards,"format":"$format","compression":"$codec","totalDocs":$total,
           |"shardCounts":{${perShard.toSeq.sorted.map { case (k, v) => s""""$k":$v""" }.mkString(",")}},
           |"state":"completed"}""".stripMargin.replace("\n", "")
      val mf = fs.create(new org.apache.hadoop.fs.Path(
        s"$outRoot/manifest_$idx.json"), true)
      mf.write(manifest.getBytes("UTF-8")); mf.close()
      // all indices share the single scan's schema -> one inferred mapping
      // serves every index (per-index divergence would need per-index
      // sources, which is the one-job-per-index case, not this one)
      mappingJson.foreach { json =>
        val mp = fs.create(new org.apache.hadoop.fs.Path(
          s"$outRoot/mapping_$idx.json"), true)
        mp.write(json.getBytes("UTF-8")); mp.close()
      }
      idx -> Result(s"$outRoot/data/_index=$idx", numShards, total, perShard)
    }.toMap
  }

  /**
   * @param docs DataFrame with at least (_id, _routing, doc) — see
   *             [[graft.transform.DocTransform.docs]].
   * @param repartition when false (reference default `--repartition false`)
   *             the shuffle is skipped and each task writes to every shard
   *             dir it sees — more small files, no exchange.
   */
  /** Codecs the JSON (Hadoop text) writer supports; parquet accepts these
    * plus zstd (parquet-java bundles zstd-jni; Hadoop text zstd would need
    * native libhadoop, so it is rejected up front instead of failing in the
    * write job). */
  private val JsonCodecs = Set("gzip", "bzip2", "deflate", "lz4", "snappy", "none")
  private val ParquetCodecs = JsonCodecs ++ Set("zstd", "lzo", "uncompressed")

  def write(docs: DataFrame, outDir: String, numShards: Int,
            partitionMultiples: Int = 10, repartition: Boolean = true,
            format: String = "json", mappingJson: Option[String] = None,
            indexName: String = "", typeName: String = "doc",
            compression: Option[String] = None): Result = {
    val spark = docs.sparkSession
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(outDir), hadoopConf)
    val outPath = new org.apache.hadoop.fs.Path(outDir)
    fs.mkdirs(outPath)
    fs.create(new org.apache.hadoop.fs.Path(outDir, "_STARTED"), true).close()

    val sharded = docs.withColumn("_shard", EsFunctions.es_shard(col("_routing"), numShards))
    // fan out on mod(hash, n*m) like the reference partitioner — NOT on the
    // _shard column, which has only n distinct values and would leave at
    // most n non-empty exchange partitions (one writer task per shard)
    val arranged =
      if (repartition) sharded.repartition(numShards * partitionMultiples,
        EsFunctions.es_partition(col("_routing"), numShards, partitionMultiples))
      else sharded

    // per-shard counts: for modest shard counts they ride the write job as
    // observable metrics (A3 parity: per-partition doc counts,
    // `Hive2ES.scala:85-90`) — one conditional-sum expression per shard.
    // Past ~64 shards that expression list itself becomes the bottleneck,
    // so large layouts count by scanning the (much smaller, columnar-
    // prunable) written output instead of re-running the pipeline.
    val observeCounts = numShards <= 64
    val obs = Observation("bundle-counts")
    val observed =
      if (observeCounts) {
        val countExprs = count(lit(1)).as("total") +:
          (0 until numShards).map(i =>
            sum(when(col("_shard") === i, 1L).otherwise(0L)).as(s"shard_$i"))
        arranged.observe(obs, countExprs.head, countExprs.tail: _*)
      } else arranged

    val writer = observed.write.mode("overwrite").partitionBy("_shard")
    // defaults: gzip for json bundles (reference-era behavior), zstd for
    // parquet (better ratio at comparable speed — the right 100 TB default)
    val codec = format match {
      case "json"                 => compression.getOrElse("gzip")
      case "parquet" | "columnar" => compression.getOrElse("zstd")
      case other     => throw new IllegalArgumentException(s"unsupported bundle format: $other")
    }
    format match {
      case "json" =>
        require(JsonCodecs(codec),
          s"json bundles support ${JsonCodecs.toSeq.sorted.mkString("/")}, not $codec" +
            (if (codec == "zstd") " (Hadoop text zstd needs native libhadoop; use --format parquet for zstd)" else ""))
        writer.option("compression", codec).json(outDir + "/data")
      case "parquet" | "columnar" =>
        // "columnar" = same parquet writer, but the docs DataFrame carries
        // TYPED source columns (DocTransform.docsColumnar) instead of one
        // JSON string — document fields become prunable/pushable columns
        require(ParquetCodecs(codec),
          s"parquet bundles support ${ParquetCodecs.toSeq.sorted.mkString("/")}, not $codec")
        writer.option("compression", codec).parquet(outDir + "/data")
    }

    val (total, perShard) =
      if (observeCounts) {
        val m = obs.get
        (m("total").asInstanceOf[Long],
          (0 until numShards).map(i => i -> m(s"shard_$i").asInstanceOf[Long]).toMap)
      } else {
        val back = format match {
          case "json" => spark.read
            .schema(graft.streaming.BundleStream.bundleSchema).json(outDir + "/data")
          case _ => spark.read.parquet(outDir + "/data")
        }
        val counts = back.groupBy(col("_shard")).agg(count(lit(1)).as("c"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        val full = (0 until numShards).map(i => i -> counts.getOrElse(i, 0L)).toMap
        (full.values.sum, full)
      }
    // null/empty routing hashes to shard 0 (reference ESHashPartitioner
    // semantics); a fully degenerate distribution usually means the routing
    // extraction came up null for every row — surface it
    if (numShards > 1 && total > 0 && perShard.getOrElse(0, 0L) == total)
      System.err.println(s"[bundle] WARNING: all $total docs landed on shard 0 — " +
        "routing may be null for every row (bad --routing/--id extraction?)")

    mappingJson.foreach { json =>
      val out = fs.create(new org.apache.hadoop.fs.Path(outDir, "mapping.json"), true)
      out.write(json.getBytes("UTF-8")); out.close()
    }
    // job-record parity with the reference's ZK node payload
    // ({numberShards, hdfsWorkDir, indexName, typeName, state},
    // ServerNotifier.scala:21-34) folded into the manifest
    val manifest =
      s"""{"indexName":"$indexName","typeName":"$typeName","workDir":"$outDir",
         |"numShards":$numShards,"format":"$format","compression":"$codec","totalDocs":$total,
         |"shardCounts":{${perShard.toSeq.sorted.map { case (k, v) => s""""$k":$v""" }.mkString(",")}},
         |"state":"completed"}""".stripMargin.replace("\n", "")
    val mf = fs.create(new org.apache.hadoop.fs.Path(outDir, "manifest.json"), true)
    mf.write(manifest.getBytes("UTF-8")); mf.close()
    fs.delete(new org.apache.hadoop.fs.Path(outDir, "_STARTED"), false)

    Result(outDir, numShards, total, perShard)
  }
}
