package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.JobContext
import org.apache.spark.internal.io.FileCommitProtocol.TaskCommitMessage
import org.apache.spark.sql.execution.datasources.SQLHadoopMapReduceCommitProtocol

/**
 * File commit protocol that makes the WRITE JOB own the bundle lifecycle
 * (reference: job state rides the write itself — started marker before any
 * data moves, shard metadata published in the same commit that publishes the
 * data, `ESContainer.scala:251-285` + `ServerNotifier.scala:21-34`):
 *
 *  - `setupJob`   -> `_STARTED` marker at the bundle root (data dir's parent)
 *  - `commitJob`  -> after the committer's temp->final renames, write
 *    `shard_state.json` from a listing of the files that were JUST committed
 *    — per shard: file count, bytes, and doc counts (exact from parquet
 *    footers for parquet/columnar bundles; `-1` for json bundles, refreshed
 *    by [[graft.sink.BundleSink]] from the write job's observe() counts)
 *
 * A driver crash after job commit can therefore never leave committed data
 * without its state blob, and a consumer that sees `shard_state.json` knows
 * the files it describes are final. Installed per-write by BundleSink via
 * `spark.sql.sources.commitProtocolClass`; constructor signature is the one
 * `FileCommitProtocol.instantiate` reflects on.
 */
class BundleCommitProtocol(jobId: String, path: String,
                           dynamicPartitionOverwrite: Boolean)
  extends SQLHadoopMapReduceCommitProtocol(jobId, path, dynamicPartitionOverwrite) {

  private def dataDir = new Path(path)
  private def bundleRoot = dataDir.getParent

  override def setupJob(jobContext: JobContext): Unit = {
    super.setupJob(jobContext)
    val fs = dataDir.getFileSystem(jobContext.getConfiguration)
    fs.create(new Path(bundleRoot, "_STARTED"), true).close()
  }

  override def commitJob(jobContext: JobContext,
                         taskCommits: Seq[TaskCommitMessage]): Unit = {
    super.commitJob(jobContext, taskCommits)
    val conf = jobContext.getConfiguration
    val fs = dataDir.getFileSystem(conf)
    val shardDirs = fs.listStatus(dataDir)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("_shard="))
      .sortBy(_.getPath.getName.stripPrefix("_shard=").toInt)
    val entries = shardDirs.map { d =>
      val shard = d.getPath.getName.stripPrefix("_shard=").toInt
      val files = fs.listStatus(d.getPath).filter(_.isFile)
        .filterNot(st => st.getPath.getName.startsWith("_") ||
          st.getPath.getName.startsWith("."))
      val bytes = files.map(_.getLen).sum
      val docs = files.foldLeft(0L) { (acc, st) =>
        if (acc < 0 || !st.getPath.getName.contains(".parquet")) -1L
        else acc + parquetRowCount(st, conf)
      }
      s"""{"shard":$shard,"docs":$docs,"files":${files.length},"bytes":$bytes}"""
    }
    val out = fs.create(new Path(bundleRoot, "shard_state.json"), true)
    out.write(entries.mkString("[", ",", "]").getBytes("UTF-8"))
    out.close()
  }

  /** Exact committed row count from the parquet footer — a metadata read
    * (no data pages), driver-side, O(files-per-shard). */
  private def parquetRowCount(st: org.apache.hadoop.fs.FileStatus,
                              conf: org.apache.hadoop.conf.Configuration): Long = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getRecordCount finally r.close()
  }
}
