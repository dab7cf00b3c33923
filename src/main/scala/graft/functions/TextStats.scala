package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * One-pass text statistics: token count, punctuation count, and per-language
 * stopword hits in a single traversal — replaces four interpreted HOF
 * passes (split + list_filter per language) in the text-analysis queries.
 *
 * Semantics are bit-compatible with the composable formulation in
 * `graft.ext.TextAnalysis` (tokens = raw text split on java-regex \s+ with
 * "" -> [""]; punctuation = [.,!?;:]; stopword matching is exact
 * case-sensitive equality against the lowercase lists) — pinned by a
 * differential spec.
 */
object TextStats {
  import graft.ext.TextAnalysis.stopwords

  private val langWords: Array[Set[String]] = stopwords.map(_._2.toSet).toArray
  private val allWords: Set[String] = stopwords.flatMap(_._2).toSet
  val numLangs: Int = langWords.length

  def compute(text: UTF8String): InternalRow = {
    val s = text.toString
    val toks = s.split("\\s+", -1)
    var punct = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '.' || c == ',' || c == '!' || c == '?' || c == ';' || c == ':') punct += 1
      i += 1
    }
    val hits = new Array[Int](numLangs)
    var allHits = 0
    var t = 0
    while (t < toks.length) {
      val tok = toks(t)
      if (allWords.contains(tok)) allHits += 1
      var l = 0
      while (l < numLangs) {
        if (langWords(l).contains(tok)) hits(l) += 1
        l += 1
      }
      t += 1
    }
    val out = new Array[Any](3 + numLangs)
    out(0) = toks.length
    out(1) = punct
    out(2) = allHits
    var l = 0
    while (l < numLangs) { out(3 + l) = hits(l); l += 1 }
    new GenericInternalRow(out)
  }
}

case class TextStatsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"text_stats requires string, got ${child.dataType.simpleString}")

  override def dataType: DataType = StructType(
    Seq(StructField("token_cnt", IntegerType, nullable = false),
      StructField("punct_cnt", IntegerType, nullable = false),
      StructField("all_hits", IntegerType, nullable = false)) ++
      graft.ext.TextAnalysis.stopwords.map { case (lang, _) =>
        StructField(s"hits_$lang", IntegerType, nullable = false)
      })
  override def prettyName: String = "text_stats"

  override protected def nullSafeEval(input: Any): Any =
    TextStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TextStatsExpr =
    copy(child = newChild)
}
