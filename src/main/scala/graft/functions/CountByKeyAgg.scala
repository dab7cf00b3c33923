package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Per-key row counts as ONE aggregate value (map<string,bigint>) — a
 * groupBy().count() that can ride an `observe()` on a write job. The sink
 * uses it for per-(index, shard) manifest counts: the counts come out of the
 * very job that wrote the files, instead of a second groupBy pass over the
 * written output (which at 100 TB is a full re-read). Mergeable
 * (elementwise sum), so it runs partial+final with map-side combine like
 * any TypedImperativeAggregate. Key cardinality must be bounded (shards x
 * indices here) — this is a metrics aggregate, not a substitute for a real
 * groupBy.
 */
case class CountByKeyAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.HashMap[String, Long]] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"count_by_key requires a string key, got ${other.simpleString}")
  }

  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "count_by_key"

  override def createAggregationBuffer(): scala.collection.mutable.HashMap[String, Long] =
    scala.collection.mutable.HashMap.empty

  override def update(buffer: scala.collection.mutable.HashMap[String, Long],
                      input: InternalRow): scala.collection.mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[UTF8String].toString
      buffer.update(k, buffer.getOrElse(k, 0L) + 1L)
    }
    buffer
  }

  override def merge(buffer: scala.collection.mutable.HashMap[String, Long],
                     other: scala.collection.mutable.HashMap[String, Long])
      : scala.collection.mutable.HashMap[String, Long] = {
    other.foreach { case (k, c) => buffer.update(k, buffer.getOrElse(k, 0L) + c) }
    buffer
  }

  override def eval(buffer: scala.collection.mutable.HashMap[String, Long]): Any = {
    // deterministic key order (map equality is order-insensitive, but stable
    // output makes metric snapshots diffable)
    val sorted = buffer.toSeq.sortBy(_._1)
    ArrayBasedMapData(
      sorted.map(kv => UTF8String.fromString(kv._1)).toArray[Any],
      sorted.map(_._2).toArray[Any])
  }

  override def serialize(buffer: scala.collection.mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (k, c) => out.writeUTF(k); out.writeLong(c) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) { m.update(in.readUTF(), in.readLong()); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountByKeyAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountByKeyAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountByKeyAgg =
    copy(child = newChildren.head)
}

object CountByKeyAgg {
  /** Column API: map<key, row count> over the aggregation scope. */
  def count_by_key(key: Column): Column =
    GraftSqlBridge.column(
      CountByKeyAgg(GraftSqlBridge.expression(key)).toAggregateExpression())
}
