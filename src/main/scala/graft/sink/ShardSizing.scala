package graft.sink

import org.apache.spark.sql.DataFrame

/**
 * Cost-based shard/fan-out sizing (`--num-shards auto`).
 *
 * The reference makes the operator choose shard count per index by hand
 * (`--number-of-shards`, required — `ArgsParser.scala:8,42-44`). At fleet
 * scale that knob is routinely wrong in both directions: too few shards
 * makes unsearchably large Lucene indices, too many melts the cluster with
 * tiny ones. This derives both knobs from the source's optimizer-estimated
 * size:
 *
 *  - numShards: input bytes / `targetShardBytes` (default 32 GB — the
 *    middle of ES's published 10-50 GB per-shard guidance), clamped to
 *    [1, maxShards].
 *  - partitionMultiples: enough write tasks that each handles
 *    ~`targetTaskBytes` (default 256 MB), expressed as a multiple of
 *    numShards (the reference's fan-out shape, `Hive2ES.scala:43`),
 *    clamped to [1, 32].
 *
 * Estimation uses `optimizedPlan.stats.sizeInBytes` — file-size based for
 * file sources AFTER partition pruning, so a `--where` on a partition
 * column sizes the pruned input, not the table. (Row-level filter
 * selectivity is NOT modeled without CBO stats — the estimate is an upper
 * bound there, which errs toward more, smaller shards.) Compressed columnar
 * input understates the JSON docs that land in bundles; `expansionFactor`
 * compensates (default 3x for parquet->json, measured on the testdata
 * tables).
 */
object ShardSizing {

  case class Decision(numShards: Int, partitionMultiples: Int,
                      estInputBytes: Long, estDocBytes: Long)

  def suggest(input: DataFrame,
              targetShardBytes: Long = 32L * 1024 * 1024 * 1024,
              targetTaskBytes: Long = 256L * 1024 * 1024,
              maxShards: Int = 1024,
              expansionFactor: Double = 3.0): Decision = {
    val estInput = input.queryExecution.optimizedPlan.stats.sizeInBytes
    val inputBytes =
      if (estInput.isValidLong) estInput.toLong else Long.MaxValue / 4
    val docBytes = (inputBytes * expansionFactor).toLong
    val shards = clamp(ceilDiv(docBytes, targetShardBytes), 1, maxShards)
    val tasks = clamp(ceilDiv(docBytes, targetTaskBytes), shards, shards * 32L)
    val multiples = clamp(ceilDiv(tasks, shards), 1, 32)
    Decision(shards.toInt, multiples.toInt, inputBytes, docBytes)
  }

  private def ceilDiv(a: Long, b: Long): Long = (a + b - 1) / b
  private def clamp(v: Long, lo: Long, hi: Long): Long = math.max(lo, math.min(hi, v))
}
