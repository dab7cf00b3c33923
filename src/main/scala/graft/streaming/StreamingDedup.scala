package graft.streaming

import graft.ext.Dedup
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/**
 * Streaming incremental near-duplicate detection: documents arrive as a
 * stream and are checked against EVERYTHING seen so far — without ever
 * recomputing over the full corpus.
 *
 * Shape: per doc, MinHash signature -> LSH band buckets (same banding as the
 * batch path, [[graft.ext.Dedup.lshCandidates]]); the stream is keyed by
 * band bucket and a transformWithState processor keeps each bucket's
 * (doc_id, signature) membership in RocksDB ListState. A new arrival
 * compares against its bucket's members (signature-agreement Jaccard
 * estimate), emits matches >= threshold, joins the bucket.
 *
 * Scale notes: state is bounded per bucket (`maxBucket`, same skew guard and
 * rationale as batch — an over-full bucket is a degenerate shingle cluster
 * whose members still meet in their other bands); state lives off-heap in
 * RocksDB with changelog checkpointing. Unlike the EMBEDDING twin's
 * fixed-depth sign-LSH (which had only 2^bits distinct buckets and
 * therefore saturated as state accumulated — the quadratic trap
 * [[StreamingEmbedDedup]]'s adaptive depth fixes), a minhash band bucket
 * is a hash of r = numHashes/bands signature slots with a ~2^64 keyspace:
 * UNRELATED docs land in the same bucket only by matching all r minhash
 * values, so bucket occupancy grows with true near-duplicate cluster size
 * (capped by `maxBucket`), not with corpus size — no epoch re-bucketing
 * needed on this path. Output carries the ESTIMATED
 * jaccard (state holds 32-slot signatures, not full shingle sets); exact
 * verification of flagged pairs is a cheap downstream batch join. The same
 * pair can surface from several bands — consumers key on
 * (doc_id, matched_id), e.g. `dropDuplicates` in foreachBatch.
 */
object StreamingDedup {

  case class BandedDoc(bucket: String, doc_id: Long, sig: Array[Long])
  case class DupMatch(doc_id: Long, matched_id: Long, est_jaccard: Double)
  case class Member(doc_id: Long, sig: Array[Long])

  class NearDupProcessor(threshold: Double, maxBucket: Int)
    extends StatefulProcessor[String, BandedDoc, DupMatch] {
    @transient private var seen: ListState[Member] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getListState[Member]("seen",
        Encoders.product[Member], TTLConfig.NONE)

    private def estJaccard(a: Array[Long], b: Array[Long]): Double = {
      var agree = 0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { if (a(i) == b(i)) agree += 1; i += 1 }
      if (n == 0) 0.0 else agree.toDouble / n
    }

    override def handleInputRows(bucket: String, rows: Iterator[BandedDoc],
                                 timerValues: TimerValues): Iterator[DupMatch] = {
      val members = scala.collection.mutable.ArrayBuffer.empty[Member]
      if (seen.exists()) members ++= seen.get()
      val out = scala.collection.mutable.ArrayBuffer.empty[DupMatch]
      rows.foreach { d =>
        if (members.size < maxBucket) {
          members.foreach { m =>
            if (m.doc_id != d.doc_id) {
              val est = estJaccard(d.sig, m.sig)
              if (est >= threshold) out += DupMatch(d.doc_id, m.doc_id, est)
            }
          }
          members += Member(d.doc_id, d.sig)
          seen.appendValue(Member(d.doc_id, d.sig))
        }
        // full bucket: degenerate cluster — this band stops growing; the
        // doc still matches through its other bands (batch-path parity)
      }
      out.iterator
    }
  }

  /** Banded form of a document stream: one row per (doc, band). */
  def banded(docs: DataFrame, idCol: String, textCol: String,
             numHashes: Int = 32, bands: Int = 8, k: Int = 3): Dataset[BandedDoc] = {
    import docs.sparkSession.implicits._
    require(numHashes % bands == 0, s"numHashes $numHashes not divisible by $bands bands")
    val r = numHashes / bands
    docs
      .withColumn("_sig", Dedup.minhashSignature(
        array_sort(Dedup.shingleHashes(col(textCol), k)), numHashes))
      .select(col(idCol).cast("long").as("doc_id"), col("_sig"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => hash(slice(col("_sig"), b * r + 1, lit(r)), b))))
      .select(concat(col("pos"), lit(":"), col("col")).as("bucket"),
        col("doc_id"), col("_sig").as("sig"))
      .as[BandedDoc]
  }

  /** Streaming matcher over a banded doc stream. */
  def matches(docs: DataFrame, idCol: String, textCol: String,
              numHashes: Int = 32, bands: Int = 8, k: Int = 3,
              threshold: Double = 0.9, maxBucket: Int = 10000): Dataset[DupMatch] = {
    val b = banded(docs, idCol, textCol, numHashes, bands, k)
    import b.sparkSession.implicits._
    b.groupByKey(_.bucket)
      .transformWithState(new NearDupProcessor(threshold, maxBucket),
        TimeMode.None(), OutputMode.Append())
  }
}
