package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * Tight-loop dot product over two array<double> columns.
 *
 * Spark's higher-order functions (zip_with + aggregate) evaluate their
 * lambdas interpreted (CodegenFallback) and allocate an intermediate array
 * per call — measured 110 s for a 12.5M-pair cosine self-join at sf0.1.
 * This expression is a single codegen'd static call over the underlying
 * ArrayData: no allocation, no virtual dispatch per element (~30x faster
 * on the same query).
 */
object DotProduct {
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}

/** One-pass unit-vector normalization (array<float|double> -> array<double>).
  *
  * The HOF formulation `transform(v, x => x / norm(v))` is quadratic when
  * interpreted: ArrayTransform is CodegenFallback, so the norm subtree nested
  * in the lambda re-evaluates per ELEMENT (dim × dim multiply-adds plus
  * per-element boxing). Catalyst also freely duplicates the expression into
  * collapsed projections and pushed isnotnull filters, multiplying the cost
  * again — at 10⁶ rows that chain turned a ~30 s cell-assignment stage into
  * tens of minutes. This kernel is one norm pass + one scale pass, codegen'd,
  * and cheap enough to duplicate. Zero vectors pass through (cosine 0 later).
  */
object UnitVec {
  def compute(a: ArrayData, fromFloat: Boolean): ArrayData = {
    val n = a.numElements()
    val out = new Array[Double](n)
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (fromFloat) a.getFloat(i).toDouble else a.getDouble(i)
      out(i) = x
      s += x * x
      i += 1
    }
    if (s > 0) {
      // divide (not multiply-by-reciprocal): bit-identical to the previous
      // x / sqrt(s) formulation, so 4-decimal oracle roundings can't flip
      val nrm = math.sqrt(s)
      i = 0
      while (i < n) { out(i) /= nrm; i += 1 }
    }
    new GenericArrayData(out)
  }
}

case class UnitVecExpr(child: Expression) extends UnaryExpression {
  private lazy val fromFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(
      s"unit_vec requires array<double|float>, got ${o.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "unit_vec"

  override protected def nullSafeEval(v: Any): Any =
    UnitVec.compute(v.asInstanceOf[ArrayData], fromFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.UnitVec.compute($v, $fromFloat)")

  override protected def withNewChildInternal(nc: Expression): UnitVecExpr =
    copy(child = nc)
}

/** Hyperplane-LSH kernels: the plane matrix (bits × dim, row-major) rides
  * the expression as a reference object. The literal-array formulation
  * (`dot(vec, array(lit…))` per bit) inlines bits × dim literals into one
  * generated function — at the data-driven `bits ≈ log2(n/64)` of a 10⁶+
  * row corpus that overflows Janino limits into interpreted fallback, the
  * same failure mode the IVF centroid tables had. */
object LshPlanes {
  /** Packed sign bits of plane·v (bit b set iff dot(plane_b, v) >= 0). */
  def signature(v: ArrayData, planes: Array[Double], bits: Int, dim: Int): Long = {
    val n = math.min(dim, v.numElements())
    var sig = 0L
    var b = 0
    while (b < bits) {
      var s = 0.0
      val off = b * dim
      var j = 0
      while (j < n) { s += planes(off + j) * v.getDouble(j); j += 1 }
      if (s >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** All per-bit plane dots (multiprobe margins). */
  def dots(v: ArrayData, planes: Array[Double], bits: Int, dim: Int): ArrayData = {
    val n = math.min(dim, v.numElements())
    val out = new Array[Double](bits)
    var b = 0
    while (b < bits) {
      var s = 0.0
      val off = b * dim
      var j = 0
      while (j < n) { s += planes(off + j) * v.getDouble(j); j += 1 }
      out(b) = s
      b += 1
    }
    new GenericArrayData(out)
  }
}

case class LshSigExpr(child: Expression, planes: Array[Double],
                      bits: Int, dim: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(
      s"lsh_sig requires array<double>, got ${o.simpleString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "lsh_sig"
  override protected def nullSafeEval(v: Any): Any =
    LshPlanes.signature(v.asInstanceOf[ArrayData], planes, bits, dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("lshPlanes", planes, "double[]")
    defineCodeGen(ctx, ev, v => s"graft.functions.LshPlanes.signature($v, $p, $bits, $dim)")
  }
  override protected def withNewChildInternal(nc: Expression): LshSigExpr =
    copy(child = nc)
}

case class LshPlaneDotsExpr(child: Expression, planes: Array[Double],
                            bits: Int, dim: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(
      s"lsh_plane_dots requires array<double>, got ${o.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "lsh_plane_dots"
  override protected def nullSafeEval(v: Any): Any =
    LshPlanes.dots(v.asInstanceOf[ArrayData], planes, bits, dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("lshPlanes", planes, "double[]")
    defineCodeGen(ctx, ev, v => s"graft.functions.LshPlanes.dots($v, $p, $bits, $dim)")
  }
  override protected def withNewChildInternal(nc: Expression): LshPlaneDotsExpr =
    copy(child = nc)
}

case class DotProductExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"dot_product requires two array<double>, got ${l.simpleString} / ${r.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotProduct.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProductExpr = copy(newLeft, newRight)
}
