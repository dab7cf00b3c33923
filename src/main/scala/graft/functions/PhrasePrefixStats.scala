package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * One-pass per-document phrase-prefix statistics — the row-local kernel
 * behind [[graft.ext.Search.phrasePrefixTopK]] (ES `match_phrase_prefix`
 * scan semantics). Per document it tokenizes ONCE (the corpus-wide
 * analysis law: lowercase, split on whitespace runs, drop empties —
 * exactly [[graft.ext.Search.tokens]]) and emits
 *
 *   (dl, ptf, hits)
 *
 * where `dl` is the token count, `ptf` the number of phrase-prefix
 * occurrence starts (positions i with tokens[i+j] == fixed(j) for every
 * fixed slot and tokens[i+m-1] starting with `prefix` — overlapping
 * starts count, the phraseFreq law), and `hits` one 0/1 flag per DISTINCT
 * SORTED fixed term ("does the doc contain it") plus a trailing flag for
 * "any token starts with `prefix`" — the df numerators of the bounded
 * corpus-stats aggregate.
 *
 * Bit-compatible with the HOF formulation it replaces
 * (`filter(sequence(0, size-m), i -> ...)` + `array_contains` +
 * `exists(startsWith)`), but those higher-order functions are
 * CodegenFallback — every start position paid an interpreted lambda and
 * every aggregate expression re-tokenized the text (no common-subexpression
 * elimination outside codegen). Guide §1.2 step 2 / §4.1: per-task work,
 * built-in-style codegen kernel, one tokenize per row per pass.
 */
object PhrasePrefixStats {
  def compute(text: UTF8String, fixed: Array[String], distinctFixed: Array[String],
              prefix: String): InternalRow = {
    val toks0 = text.toLowerCase.toString.split("\\s+", -1)
    // compact in place to the non-empty token sequence
    var n = 0
    var i = 0
    while (i < toks0.length) {
      if (toks0(i).nonEmpty) { toks0(n) = toks0(i); n += 1 }
      i += 1
    }
    val m = fixed.length + 1
    var ptf = 0
    var s = 0
    while (s + m <= n) {
      var ok = true
      var j = 0
      while (ok && j < fixed.length) {
        if (toks0(s + j) != fixed(j)) ok = false
        j += 1
      }
      if (ok && toks0(s + m - 1).startsWith(prefix)) ptf += 1
      s += 1
    }
    val hits = new Array[Int](distinctFixed.length + 1)
    i = 0
    while (i < n) {
      val t = toks0(i)
      var k = 0
      while (k < distinctFixed.length) {
        if (hits(k) == 0 && t == distinctFixed(k)) hits(k) = 1
        k += 1
      }
      if (hits(distinctFixed.length) == 0 && t.startsWith(prefix))
        hits(distinctFixed.length) = 1
      i += 1
    }
    InternalRow(n, ptf, new GenericArrayData(hits))
  }
}

case class PhrasePrefixStatsExpr(child: Expression, fixed: Seq[String],
                                 prefix: String) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"phrase_prefix_stats requires string, got ${child.dataType.simpleString}")

  override def dataType: DataType = StructType(Seq(
    StructField("dl", IntegerType, nullable = false),
    StructField("ptf", IntegerType, nullable = false),
    StructField("hits", ArrayType(IntegerType, containsNull = false),
      nullable = false)))

  override def prettyName: String = "phrase_prefix_stats"

  @transient private lazy val fixedArr: Array[String] = fixed.toArray
  @transient private lazy val distinctFixedArr: Array[String] =
    fixed.distinct.sorted.toArray

  def computeRow(text: UTF8String): InternalRow =
    PhrasePrefixStats.compute(text, fixedArr, distinctFixedArr, prefix)

  override protected def nullSafeEval(input: Any): Any =
    computeRow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ppStats", this,
      classOf[PhrasePrefixStatsExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.computeRow($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): PhrasePrefixStatsExpr =
    copy(child = newChild)
}
