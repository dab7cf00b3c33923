package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType}

/**
 * Bounded per-group top-k aggregate (TypedImperativeAggregate, the
 * [[MinHashSketchAgg]] mutable-buffer surface): keeps the k SMALLEST input
 * values under the child type's natural Catalyst ordering in a size-k heap,
 * and evaluates to the sorted (ascending) array of survivors.
 *
 * This is the scale-safe replacement for the
 * `row_number().over(Window.partitionBy(g).orderBy(...)) <= k` idiom: the
 * window form materializes EVERY row of a group in one task and sorts it —
 * a group whose matched set is corpus-sized (a stopword-ish BM25 term, a
 * high-cardinality facet) becomes a single-task corpus sort. The aggregate
 * runs partial+final with map-side combine instead: each task keeps at most
 * k rows per group, the shuffle carries ≤ k·tasks rows per group, and no
 * task ever sorts more than k elements at once.
 *
 * Descending order is the caller's move: negate the sort key (the
 * `struct(-score, id)` convention), then negate it back after
 * `posexplode` — ascending heap order over the negated key IS
 * (score desc, id asc), and struct ordering puts NULL fields first
 * (ASC NULLS FIRST), matching the facets tie-break law.
 */
case class TopKAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Buffer] {

  require(k > 0, "top_k needs k > 0")

  override def checkInputDataTypes(): TypeCheckResult =
    TypeUtils.checkForOrderingExpr(child.dataType, prettyName)

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "top_k"

  // natural ascending ordering of the child type (struct ordering is
  // field-by-field, nulls first — the ASC NULLS FIRST SQL default)
  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def createAggregationBuffer(): TopKAgg.Buffer =
    new TopKAgg.Buffer(k, ordering)

  override def update(buffer: TopKAgg.Buffer, input: InternalRow): TopKAgg.Buffer = {
    val v = child.eval(input)
    // null inputs are skipped (the Collect-family convention); a struct
    // with null FIELDS is a normal orderable value and is kept
    if (v != null) buffer.insert(v)
    buffer
  }

  override def merge(buffer: TopKAgg.Buffer, other: TopKAgg.Buffer): TopKAgg.Buffer = {
    other.foreach(buffer.insert)
    buffer
  }

  override def eval(buffer: TopKAgg.Buffer): Any =
    new GenericArrayData(buffer.sortedAscending)

  // partial+final transport: each element serialized as a 1-column
  // UnsafeRow (length-prefixed), the Collect-aggregate wire format
  @transient private lazy val proj = UnsafeProjection.create(Array(child.dataType))

  override def serialize(buffer: TopKAgg.Buffer): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    val elems = buffer.sortedAscending
    dos.writeInt(elems.length)
    val holder = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
    elems.foreach { v =>
      holder.update(0, v)
      val bytes = proj.apply(holder).getBytes
      dos.writeInt(bytes.length)
      dos.write(bytes)
    }
    dos.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Buffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    val row = new UnsafeRow(1)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      row.pointTo(b, len)
      buf.insert(InternalRow.copyValue(row.get(0, child.dataType)))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(child = newChildren.head)
}

object TopKAgg {

  /** Size-bounded max-heap keeping the k smallest values: the heap head is
    * the LARGEST survivor, evicted when a smaller value arrives at
    * capacity. Inserted values are defensively copied (Catalyst reuses
    * input rows between `update` calls). */
  final class Buffer(k: Int, ord: Ordering[Any]) {
    private val heap = new java.util.PriorityQueue[Any](
      math.min(k, 1024) + 1, ord.reverse)

    def insert(v: Any): Unit = {
      if (heap.size < k) heap.add(InternalRow.copyValue(v))
      else if (ord.lt(v, heap.peek())) {
        heap.poll()
        heap.add(InternalRow.copyValue(v))
      }
    }

    def foreach(f: Any => Unit): Unit = heap.forEach(v => f(v))

    def sortedAscending: Array[Any] = {
      val arr = heap.toArray
      java.util.Arrays.sort(arr, ord.asInstanceOf[Ordering[AnyRef]]
        .asInstanceOf[java.util.Comparator[AnyRef]])
      arr
    }
  }

  /** Column API: the k smallest values of `sortKey` per group, as a sorted
    * ascending array. For a top-k by DESCENDING score pass
    * `struct(-score, tieBreak)` and negate the score back after explode. */
  def top_k(sortKey: Column, k: Int): Column =
    GraftSqlBridge.column(
      TopKAgg(GraftSqlBridge.expression(sortKey), k).toAggregateExpression())
}
