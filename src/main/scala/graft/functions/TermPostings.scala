package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * One-pass per-document term postings: tokenize (the corpus-wide analysis
 * law — lowercase, split on whitespace runs, drop empties, exactly
 * [[graft.ext.Search.tokens]]) and aggregate per distinct term in a single
 * row-local pass, emitting one struct per distinct term:
 *
 *   (term, dl, tf, positions)   — positional = true
 *   (term, dl, tf)              — positional = false
 *
 * where `dl` is the document length (token count, as double — repeated per
 * entry so one `explode` yields the full postings row), `tf` the term's
 * occurrence count (double) and `positions` the ascending 0-based token
 * positions of the term.
 *
 * Bit-compatible with the shuffle formulation
 * {{{
 *   select(doc_id, size(w).cast("double").as("dl"), posexplode(w))
 *     .groupBy(doc_id, dl, term)
 *     .agg(count(*).cast("double").as(tf),
 *          sort_array(collect_list(pos)).as(positions))
 * }}}
 * (pinned by a differential spec) — but computed WITHOUT the exchange: all
 * of a document's tokens live in its own row, so the per-(doc, term)
 * aggregate never needs to leave the task. This removes the one full
 * shuffle of the postings volume from every index build
 * (guide §2.3 "aggregate before you shuffle" taken to its limit: there is
 * nothing left to shuffle).
 */
object TermPostings {
  /** Entry order is first occurrence; consumers treat postings as a set. */
  def compute(text: UTF8String, positional: Boolean): GenericArrayData = {
    // UTF8String.toLowerCase first (the exact `lower()` kernel), then the
    // same Java regex split the scan-side `split(text, "\\s+")` uses.
    val toks = text.toLowerCase.toString.split("\\s+", -1)
    // per-term tf + positions over the FILTERED token sequence (positions
    // number non-empty tokens only, matching posexplode over tokens())
    val order = new java.util.ArrayList[String]()
    val tfs = new java.util.HashMap[String, Array[Int]]() // growable pos buf
    val lens = new java.util.HashMap[String, Integer]()
    var pos = 0
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty) {
        val n = lens.get(t)
        if (n == null) {
          order.add(t)
          val buf = new Array[Int](4)
          buf(0) = pos
          tfs.put(t, buf)
          lens.put(t, 1)
        } else {
          var buf = tfs.get(t)
          if (n >= buf.length) {
            val bigger = new Array[Int](buf.length * 2)
            System.arraycopy(buf, 0, bigger, 0, buf.length)
            tfs.put(t, bigger)
            buf = bigger
          }
          buf(n) = pos
          lens.put(t, n + 1)
        }
        pos += 1
      }
      i += 1
    }
    val dl = pos.toDouble
    val out = new Array[Any](order.size)
    var j = 0
    while (j < order.size) {
      val t = order.get(j)
      val n: Int = lens.get(t)
      val row =
        if (positional) {
          val ps = new Array[Int](n)
          System.arraycopy(tfs.get(t), 0, ps, 0, n)
          InternalRow(UTF8String.fromString(t), dl, n.toDouble,
            new GenericArrayData(ps))
        } else InternalRow(UTF8String.fromString(t), dl, n.toDouble)
      out(j) = row
      j += 1
    }
    new GenericArrayData(out)
  }
}

case class TermPostingsExpr(child: Expression, positional: Boolean)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"term_postings requires string, got ${child.dataType.simpleString}")

  override def dataType: DataType = {
    val base = Seq(
      StructField("term", StringType, nullable = false),
      StructField("dl", DoubleType, nullable = false),
      StructField("tf", DoubleType, nullable = false))
    val fields =
      if (positional)
        base :+ StructField("positions",
          ArrayType(IntegerType, containsNull = false), nullable = false)
      else base
    ArrayType(StructType(fields), containsNull = false)
  }

  override def prettyName: String = "term_postings"

  override protected def nullSafeEval(input: Any): Any =
    TermPostings.compute(input.asInstanceOf[UTF8String], positional)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TermPostings.compute($c, $positional)")

  override protected def withNewChildInternal(newChild: Expression): TermPostingsExpr =
    copy(child = newChild)
}
