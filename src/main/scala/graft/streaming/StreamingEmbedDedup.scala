package graft.streaming

import graft.ext.Similarity
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/**
 * Streaming incremental EMBEDDING near-dup: vectors arrive as a stream and
 * are checked against everything accepted so far — the embedding analog of
 * [[StreamingDedup]] (which keys on MinHash band buckets over text).
 *
 * Shape: per vector, sign-LSH signatures for `tables` tables (same fmix64
 * hyperplanes as the batch path [[graft.ext.Similarity.cosineNearDupsLsh]]);
 * the stream is keyed by (table:signature) bucket, a transformWithState
 * processor keeps each bucket's (vec_id, unit vector) members in RocksDB
 * ListState, and a new arrival emits EXACT cosine matches >= threshold
 * against its bucket before joining it.
 *
 * Scale notes: per-bucket state is bounded (`maxBucket`, batch-path parity —
 * an over-full bucket is a degenerate cluster whose members still meet in
 * their other tables); vectors live once per table in off-heap RocksDB with
 * changelog checkpoints. The same pair can surface from several tables —
 * consumers key on (vec_id, matched_id), e.g. dropDuplicates in
 * foreachBatch. Unlike the text path the emitted score is already the exact
 * cosine — no downstream verify needed.
 */
object StreamingEmbedDedup {

  case class BucketedVec(bucket: String, vec_id: Long, vec: Array[Double])
  case class VecMatch(vec_id: Long, matched_id: Long, cosine: Double)
  private case class VMember(vec_id: Long, vec: Array[Double])

  class EmbedDupProcessor(threshold: Double, maxBucket: Int)
    extends StatefulProcessor[String, BucketedVec, VecMatch] {
    @transient private var seen: ListState[VMember] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getListState[VMember]("seen",
        Encoders.product[VMember], TTLConfig.NONE)

    // members are unit vectors -> cosine is a plain dot
    private def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { s += a(i) * b(i); i += 1 }
      s
    }

    override def handleInputRows(bucket: String, rows: Iterator[BucketedVec],
                                 timerValues: TimerValues): Iterator[VecMatch] = {
      val members = scala.collection.mutable.ArrayBuffer.empty[VMember]
      if (seen.exists()) members ++= seen.get()
      val out = scala.collection.mutable.ArrayBuffer.empty[VecMatch]
      rows.foreach { v =>
        if (members.size < maxBucket) {
          members.foreach { m =>
            if (m.vec_id != v.vec_id) {
              val c = dot(v.vec, m.vec)
              if (c >= threshold) out += VecMatch(v.vec_id, m.vec_id, c)
            }
          }
          members += VMember(v.vec_id, v.vec)
          seen.appendValue(VMember(v.vec_id, v.vec))
        }
        // full bucket: stops growing; the vector still matches through its
        // other tables (batch-path parity)
      }
      out.iterator
    }
  }

  /** Bucketed form of a vector stream: one row per (vector, table). */
  def bucketed(vecs: DataFrame, idCol: String, vecCol: String, dim: Int,
               tables: Int = 8, bits: Int = 8): Dataset[BucketedVec] = {
    import vecs.sparkSession.implicits._
    val asD = col(vecCol).cast("array<double>")
    vecs
      .select(col(idCol).cast("long").as("vec_id"),
        Similarity.unitize(asD).as("_v"),
        posexplode(array((0 until tables).map(t =>
          Similarity.lshSignature(asD, dim, t, bits)): _*)))
      .select(concat(col("pos"), lit(":"), col("col")).as("bucket"),
        col("vec_id"), col("_v").as("vec"))
      .as[BucketedVec]
  }

  /** Streaming matcher over a bucketed vector stream. */
  def matches(vecs: DataFrame, idCol: String, vecCol: String, dim: Int,
              tables: Int = 8, bits: Int = 8, threshold: Double = 0.9,
              maxBucket: Int = 10000): Dataset[VecMatch] = {
    val b = bucketed(vecs, idCol, vecCol, dim, tables, bits)
    import b.sparkSession.implicits._
    b.groupByKey(_.bucket)
      .transformWithState(new EmbedDupProcessor(threshold, maxBucket),
        TimeMode.None(), OutputMode.Append())
  }
}
