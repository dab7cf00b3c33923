package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * One-pass char n-gram extraction with normalization (lowercase + collapse
 * whitespace runs), for the n-gram LM ([[graft.ext.NgramLm]]).
 *
 * The HOF formulation `transform(sequence(...), i => normalized.substr(i, n))`
 * nested the normalized-text subtree (regexp_replace + lower over the WHOLE
 * document) inside the per-element lambda — interpreted evaluation re-ran it
 * once per n-gram, making extraction O(len²) per document. This kernel
 * normalizes once and slices by code point (matching Spark `substr`
 * semantics), bit-compatible with the HOF form (pinned by NgramLmSpec).
 */
object CharNgrams {
  def compute(text: UTF8String, n: Int): ArrayData = {
    if (text == null) return new GenericArrayData(Array.empty[Any])
    // lower = UTF8String semantics (same as Spark lower());
    // whitespace collapse = Java regex (same engine as Spark regexp_replace)
    val normalized = UTF8String.fromString(
      text.toLowerCase.toString.replaceAll("\\s+", " "))
    val chars = normalized.numChars()
    if (chars < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](chars - n + 1)
    var i = 0
    while (i <= chars - n) {
      out(i) = normalized.substring(i, i + n)
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class CharNgramsExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"char_ngrams n must be >= 1, got $n")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(
      s"char_ngrams requires string, got ${o.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  // NO null propagation: null text yields an EMPTY ARRAY, matching the
  // pinned HOF reference (`when(text.isNull, array()).otherwise(...)`) —
  // the UnaryExpression default would short-circuit to SQL NULL and leave
  // CharNgrams.compute's null branch dead (NgramLmSpec pins a null row)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    CharNgrams.compute(child.eval(input).asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.functions.CharNgrams.compute(${c.isNull} ? null : ${c.value}, $n);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(nc: Expression): CharNgramsExpr =
    copy(child = nc)
}
