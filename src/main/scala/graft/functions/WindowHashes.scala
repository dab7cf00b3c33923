package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/**
 * Positional k-word window hashes: hash of EVERY k-token window of the
 * text, in document order, non-distinct — the per-position sibling of
 * [[ShingleHashes]] (which dedupes and drops positions). Output index i is
 * the window starting at token i, so span arithmetic (`[i, i+k-1]` token
 * coverage) works directly on `posexplode` output; repeated-span dedup
 * ([[graft.ext.Dedup.repeatedSpans]]) depends on that alignment.
 *
 * Tokenization matches ShingleHashes (lowercase, trim, split on
 * whitespace runs) and the hash is Spark's seed-42 XXH64 over the UTF-8
 * bytes of the space-joined window. A text with fewer than k tokens has
 * NO k-window and yields an empty array (unlike ShingleHashes' whole-text
 * fallback, which exists for set-similarity where an empty set would make
 * Jaccard degenerate).
 */
object WindowHashes {
  private val Seed = 42L

  def compute(text: UTF8String, k: Int): GenericArrayData = {
    // drop empty tokens: "".split yields Array(""), which at k=1 would emit
    // a spurious hash of "" — the shared tokenization law (Decontaminate
    // .tokenize, the q73 oracle) counts blank text as ZERO tokens
    val toks = text.toLowerCase.trim.toString.split("\\s+", -1).filter(_.nonEmpty)
    val n = toks.length
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n - k + 1)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i + k <= n) {
      sb.setLength(0)
      var j = i
      while (j < i + k) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      val bytes = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out(i) = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, Seed)
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class WindowHashesExpr(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "window size must be >= 1")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"window_hashes requires string, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "window_hashes"

  override protected def nullSafeEval(input: Any): Any =
    WindowHashes.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WindowHashes.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): WindowHashesExpr =
    copy(child = newChild)
}
