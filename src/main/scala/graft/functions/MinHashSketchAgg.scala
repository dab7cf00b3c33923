package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Mergeable MinHash sketch aggregate (TypedImperativeAggregate — the
 * mutable-buffer aggregation surface, complementing the Aggregator-based
 * GeoMean): the MinHash signature of the UNION of all input element sets.
 *
 * Input rows carry array<long> element hashes (e.g. shingle_hashes of each
 * document); the buffer is the running elementwise-min signature. Because
 * min is associative and commutative, Spark runs it partial+final with
 * map-side combine, which gives corpus/group-level similarity WITHOUT any
 * pair join: sketch(A union B) = min(sketch(A), sketch(B)), and estimated
 * jaccard(G1, G2) = fraction of agreeing signature slots.
 */
case class MinHashSketchAgg(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sketch requires array<bigint> element hashes, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "minhash_sketch"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val sig = MinHashSig.compute(v.asInstanceOf[ArrayData], numHashes)
      var i = 0
      while (i < numHashes) {
        val s = sig.getLong(i)
        if (s < buffer(i)) buffer(i) = s
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (other(i) < buffer(i)) buffer(i) = other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(numHashes * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSketchAgg =
    copy(child = newChildren.head)
}

object MinHashSketchAgg {
  /** Column API: minhash sketch of the union of all element-hash arrays. */
  def minhash_sketch(elementHashes: Column, numHashes: Int = 32): Column =
    GraftSqlBridge.column(
      MinHashSketchAgg(GraftSqlBridge.expression(elementHashes), numHashes)
        .toAggregateExpression())

  /** Estimated jaccard between two sketches: agreeing-slot fraction. */
  def sketchJaccard(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions._
    val agree = size(filter(zip_with(a, b, (x, y) =>
      org.apache.spark.sql.functions.when(x === y, 1).otherwise(0)), v => v === 1))
    agree.cast("double") / size(a).cast("double")
  }
}
