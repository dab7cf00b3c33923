package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/**
 * Product-quantization kernels (used by [[graft.ext.Similarity]] PQ search).
 *
 * A PQ model splits a dim-D vector into `m` subspaces of `subDim = D/m`
 * dims, each quantized to one of `k` per-subspace centroids; a vector
 * becomes `m` small ints (codes). Asymmetric scoring (query stays exact):
 * the query precomputes a lookup table LUT[sub][centroid] = dot(q_sub, c),
 * and scoring a corpus vector is `m` table lookups + adds instead of `D`
 * multiply-adds — the memory-bandwidth shape that makes billion-vector
 * scans feasible. Both kernels are codegen'd; the centroid table rides the
 * expression as a reference object (no per-row allocation).
 */
object Pq {

  /** codes(sub) = argmin over centroids of ||v_sub - c||^2, computed as
    * argmax of (2*dot - ||c||^2) — equivalent and one pass. */
  def encode(vec: ArrayData, cents: Array[Double], centNorms: Array[Double],
             m: Int, k: Int, subDim: Int): ArrayData = {
    val codes = new Array[Int](m)
    var sub = 0
    while (sub < m) {
      var best = 0
      var bestScore = Double.NegativeInfinity
      var c = 0
      while (c < k) {
        val off = (sub * k + c) * subDim
        var dot = 0.0
        var j = 0
        while (j < subDim) {
          dot += vec.getDouble(sub * subDim + j) * cents(off + j)
          j += 1
        }
        val score = 2.0 * dot - centNorms(sub * k + c)
        if (score > bestScore) { bestScore = score; best = c }
        c += 1
      }
      codes(sub) = best
      sub += 1
    }
    new GenericArrayData(codes)
  }

  /** LUT for one query: lut(sub*k + c) = dot(q_sub, centroid[sub][c]). */
  def lut(vec: ArrayData, cents: Array[Double], m: Int, k: Int,
          subDim: Int): ArrayData = {
    val out = new Array[Double](m * k)
    var sub = 0
    while (sub < m) {
      var c = 0
      while (c < k) {
        val off = (sub * k + c) * subDim
        var dot = 0.0
        var j = 0
        while (j < subDim) {
          dot += vec.getDouble(sub * subDim + j) * cents(off + j)
          j += 1
        }
        out(sub * k + c) = dot
        c += 1
      }
      sub += 1
    }
    new GenericArrayData(out)
  }

  /** score = sum_sub lut(sub*k + codes(sub)) ~= dot(query, corpusVec). */
  def score(lut: ArrayData, codes: ArrayData, k: Int): Double = {
    val m = codes.numElements()
    var acc = 0.0
    var sub = 0
    while (sub < m) {
      acc += lut.getDouble(sub * k + codes.getInt(sub))
      sub += 1
    }
    acc
  }

  /** decode codes -> concatenated sub-centroid values: the PQ reconstruction
    * x̂ of the encoded vector, in the ENCODED space (rotated/permuted when
    * the model trained one). m array reads per row — the exact inverse
    * shape of [[encode]], used when the original vectors were not stored
    * (codes-only indexes) but downstream work needs a vector to reason
    * about (e.g. re-training sub-centroids for a cell split). */
  def decode(codes: ArrayData, cents: Array[Double], k: Int,
             subDim: Int): ArrayData = {
    val m = codes.numElements()
    val out = new Array[Double](m * subDim)
    var sub = 0
    while (sub < m) {
      val off = (sub * k + codes.getInt(sub)) * subDim
      var j = 0
      while (j < subDim) { out(sub * subDim + j) = cents(off + j); j += 1 }
      sub += 1
    }
    new GenericArrayData(out)
  }

  /** r = v - centroid[cellId] against a flat (nlist x dim) coarse-centroid
    * table — the IVFADC residual (Jégou et al., TPAMI 2011): encoding the
    * offset from the cell centroid instead of the raw vector gives the
    * codebooks a zero-mean, low-spread distribution to quantize. */
  def cellResidual(vec: ArrayData, cellId: Int, cents: Array[Double],
                   dim: Int): ArrayData = {
    val out = new Array[Double](dim)
    val off = cellId * dim
    var j = 0
    while (j < dim) { out(j) = vec.getDouble(j) - cents(off + j); j += 1 }
    new GenericArrayData(out)
  }

  /** dot(v, centroid[cellId]) — the exact per-(query, cell) term of the
    * residual ADC decomposition dot(q, v) = dot(q, c) + dot(q, r). */
  def cellDot(vec: ArrayData, cellId: Int, cents: Array[Double],
              dim: Int): Double = {
    val off = cellId * dim
    var s = 0.0
    var j = 0
    while (j < dim) { s += vec.getDouble(j) * cents(off + j); j += 1 }
    s
  }

  /** y = R * v for a row-major dim x dim matrix R (OPQ rotation at encode
    * time — an orthogonal R preserves dot products, so rotated-space PQ
    * scores remain estimates of the original-space cosine). */
  def matvec(vec: ArrayData, rot: Array[Double], dim: Int): ArrayData = {
    val out = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      var s = 0.0
      val off = i * dim
      var j = 0
      while (j < dim) { s += rot(off + j) * vec.getDouble(j); j += 1 }
      out(i) = s
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Encode a (unit) vector into m PQ codes against a fixed centroid table. */
case class PqEncodeExpr(child: Expression, cents: Array[Double],
                        m: Int, k: Int, subDim: Int) extends UnaryExpression {
  private lazy val centNorms: Array[Double] = {
    val norms = new Array[Double](m * k)
    var i = 0
    while (i < m * k) {
      var s = 0.0
      var j = 0
      while (j < subDim) { val x = cents(i * subDim + j); s += x * x; j += 1 }
      norms(i) = s
      i += 1
    }
    norms
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(s"pq_encode requires array<double>, got ${o.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(v: Any): Any =
    Pq.encode(v.asInstanceOf[ArrayData], cents, centNorms, m, k, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = ctx.addReferenceObj("pqCents", cents, "double[]")
    val n = ctx.addReferenceObj("pqNorms", centNorms, "double[]")
    defineCodeGen(ctx, ev, v => s"graft.functions.Pq.encode($v, $c, $n, $m, $k, $subDim)")
  }
  override protected def withNewChildInternal(nc: Expression): PqEncodeExpr =
    copy(child = nc)
}

/** Decode m PQ codes back to the reconstruction x̂ (encoded space). */
case class PqDecodeExpr(child: Expression, cents: Array[Double],
                        k: Int, subDim: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(s"pq_decode requires array<int>, got ${o.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_decode"

  override protected def nullSafeEval(v: Any): Any =
    Pq.decode(v.asInstanceOf[ArrayData], cents, k, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = ctx.addReferenceObj("pqCents", cents, "double[]")
    defineCodeGen(ctx, ev, v => s"graft.functions.Pq.decode($v, $c, $k, $subDim)")
  }
  override protected def withNewChildInternal(nc: Expression): PqDecodeExpr =
    copy(child = nc)
}

/** Per-query LUT: array<double> of m*k subspace dots. */
case class PqLutExpr(child: Expression, cents: Array[Double],
                     m: Int, k: Int, subDim: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(s"pq_lut requires array<double>, got ${o.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_lut"

  override protected def nullSafeEval(v: Any): Any =
    Pq.lut(v.asInstanceOf[ArrayData], cents, m, k, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = ctx.addReferenceObj("pqCents", cents, "double[]")
    defineCodeGen(ctx, ev, v => s"graft.functions.Pq.lut($v, $c, $m, $k, $subDim)")
  }
  override protected def withNewChildInternal(nc: Expression): PqLutExpr =
    copy(child = nc)
}

/** ADC score of (query LUT, corpus codes) — m lookups, no multiplies. */
case class PqScoreExpr(left: Expression, right: Expression, k: Int)
  extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_score requires (array<double> lut, array<int> codes), got ${l.simpleString} / ${r.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_score"

  override protected def nullSafeEval(l: Any, c: Any): Any =
    Pq.score(l.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, c) => s"graft.functions.Pq.score($l, $c, $k)")

  override protected def withNewChildrenInternal(nl: Expression, nr: Expression): PqScoreExpr =
    copy(left = nl, right = nr)
}

/** Per-cell residual (vec - coarseCentroid[cellId]); the coarse table rides
  * the expression as a reference object. Codegen'd — it sits on the
  * corpus-sized encode path of residual indexes. */
case class CellResidualExpr(left: Expression, right: Expression,
                            cents: Array[Double], dim: Int)
  extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"cell_residual requires (array<double>, int), got ${l.simpleString} / ${r.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "cell_residual"

  override protected def nullSafeEval(v: Any, c: Any): Any =
    Pq.cellResidual(v.asInstanceOf[ArrayData], c.asInstanceOf[Int], cents, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = ctx.addReferenceObj("coarseCents", cents, "double[]")
    defineCodeGen(ctx, ev, (v, c) => s"graft.functions.Pq.cellResidual($v, $c, $t, $dim)")
  }
  override protected def withNewChildrenInternal(nl: Expression, nr: Expression): CellResidualExpr =
    copy(left = nl, right = nr)
}

/** dot(vec, coarseCentroid[cellId]) — the exact term of the residual ADC
  * score; evaluated once per (query, probed cell), never per candidate. */
case class CellDotExpr(left: Expression, right: Expression,
                       cents: Array[Double], dim: Int)
  extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"cell_dot requires (array<double>, int), got ${l.simpleString} / ${r.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cell_dot"

  override protected def nullSafeEval(v: Any, c: Any): Any =
    Pq.cellDot(v.asInstanceOf[ArrayData], c.asInstanceOf[Int], cents, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = ctx.addReferenceObj("coarseCents", cents, "double[]")
    defineCodeGen(ctx, ev, (v, c) => s"graft.functions.Pq.cellDot($v, $c, $t, $dim)")
  }
  override protected def withNewChildrenInternal(nl: Expression, nr: Expression): CellDotExpr =
    copy(left = nl, right = nr)
}

/** Dense rotation applied to a vector; the matrix rides the expression as a
  * reference object (same pattern as the PQ centroid tables). */
case class MatVecExpr(child: Expression, rot: Array[Double], dim: Int)
  extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(s"mat_vec requires array<double>, got ${o.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "mat_vec"

  override protected def nullSafeEval(v: Any): Any =
    Pq.matvec(v.asInstanceOf[ArrayData], rot, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.addReferenceObj("rotMat", rot, "double[]")
    defineCodeGen(ctx, ev, v => s"graft.functions.Pq.matvec($v, $r, $dim)")
  }
  override protected def withNewChildInternal(nc: Expression): MatVecExpr =
    copy(child = nc)
}

object PqFunctions {
  def mat_vec(vec: Column, rot: Array[Double], dim: Int): Column =
    GraftSqlBridge.column(MatVecExpr(GraftSqlBridge.expression(vec), rot, dim))
  def pq_encode(vec: Column, cents: Array[Double], m: Int, k: Int, subDim: Int): Column =
    GraftSqlBridge.column(PqEncodeExpr(GraftSqlBridge.expression(vec), cents, m, k, subDim))
  def pq_decode(codes: Column, cents: Array[Double], k: Int, subDim: Int): Column =
    GraftSqlBridge.column(PqDecodeExpr(GraftSqlBridge.expression(codes), cents, k, subDim))
  def pq_lut(vec: Column, cents: Array[Double], m: Int, k: Int, subDim: Int): Column =
    GraftSqlBridge.column(PqLutExpr(GraftSqlBridge.expression(vec), cents, m, k, subDim))
  def pq_score(lut: Column, codes: Column, k: Int): Column =
    GraftSqlBridge.column(PqScoreExpr(
      GraftSqlBridge.expression(lut), GraftSqlBridge.expression(codes), k))
  def cell_residual(vec: Column, cellId: Column, cents: Array[Double], dim: Int): Column =
    GraftSqlBridge.column(CellResidualExpr(
      GraftSqlBridge.expression(vec), GraftSqlBridge.expression(cellId), cents, dim))
  def cell_dot(vec: Column, cellId: Column, cents: Array[Double], dim: Int): Column =
    GraftSqlBridge.column(CellDotExpr(
      GraftSqlBridge.expression(vec), GraftSqlBridge.expression(cellId), cents, dim))
}
