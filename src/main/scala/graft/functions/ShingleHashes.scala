package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/**
 * One-pass distinct word-k-shingle hashes of a text column.
 *
 * Bit-compatible with the composable formulation
 * `transform(array_distinct(shingles(text, k)), xxhash64)` (shingle = k
 * whitespace tokens of lowercase/trimmed text joined by one space; a text
 * with fewer than k tokens yields the single whole-text shingle; xxhash64 =
 * Spark's seed-42 XXH64 over UTF-8 bytes) — the equality is pinned by a
 * differential spec. The HOF version evaluates interpreted lambdas and
 * materializes every shingle string; this evaluates one codegen'd call.
 */
object ShingleHashes {
  private val Seed = 42L

  def compute(text: UTF8String, k: Int): GenericArrayData = {
    val toks = text.toLowerCase.trim.toString.split("\\s+", -1)
    val n = toks.length
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val sb = new java.lang.StringBuilder()
    def hashJoined(from: Int, until: Int): Unit = {
      sb.setLength(0)
      var i = from
      while (i < until) {
        if (i > from) sb.append(' ')
        sb.append(toks(i))
        i += 1
      }
      val bytes = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      seen.add(XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, Seed))
    }
    if (n < k) hashJoined(0, n)
    else {
      var i = 0
      while (i + k <= n) { hashJoined(i, i + k); i += 1 }
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
}

case class ShingleHashesExpr(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "shingle size must be >= 1")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires string, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHashes.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}
