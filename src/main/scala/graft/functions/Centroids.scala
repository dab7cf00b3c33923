package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/**
 * Coarse-quantizer cell assignment kernels (used by [[graft.ext.Similarity]]
 * IVF / k-means). The centroid matrix rides the expression as a reference
 * object (one flat `Array[Double]` of nlist x dim, exactly like
 * [[Pq]]'s centroid table) — NOT as literal arrays in the generated code.
 * The literal-array formulation put nlist x dim constants into one generated
 * method: past nlist ~ 1k (the auto-router picks nlist = sqrt(n)/2, so any
 * corpus >= ~4M vectors) it blows Janino's constant-pool/64KB-method limits
 * and falls back to interpreted eval or fails outright. Here the generated
 * code is a single static call scanning the payload array, constant-size in
 * nlist — one codegen'd argmax regardless of how many cells.
 *
 * Tie behavior matches the previous formulation exactly (first/smallest
 * index wins; top-`probes` order is sim desc, index asc) so assignment — and
 * therefore every IVF/k-means result downstream — is unchanged.
 */
object Centroids {

  /** argmax over cells of dot(vec, centroid(cell)); ties -> smallest index.
    * Sequential fold per cell in index order — bit-compatible with the
    * DotProduct expression the literal formulation used. */
  def bestCell(vec: ArrayData, cents: Array[Double], nlist: Int, dim: Int): Int = {
    var best = 0
    var bestScore = Double.NegativeInfinity
    var c = 0
    while (c < nlist) {
      val off = c * dim
      var d = 0.0
      var j = 0
      while (j < dim) { d += vec.getDouble(j) * cents(off + j); j += 1 }
      if (d > bestScore) { bestScore = d; best = c }
      c += 1
    }
    best
  }

  /** Top-`probes` cell ids ordered by (dot desc, index asc) — the multiprobe
    * query-side assignment. Selection loop, probes passes over an nlist
    * scratch array; probes is small (<= nlist/4 in practice). */
  def topCells(vec: ArrayData, cents: Array[Double], nlist: Int, dim: Int,
               probes: Int): ArrayData = {
    val sims = new Array[Double](nlist)
    var c = 0
    while (c < nlist) {
      val off = c * dim
      var d = 0.0
      var j = 0
      while (j < dim) { d += vec.getDouble(j) * cents(off + j); j += 1 }
      sims(c) = d
      c += 1
    }
    val p = math.min(probes, nlist)
    val out = new Array[Int](p)
    val taken = new Array[Boolean](nlist)
    var i = 0
    while (i < p) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      c = 0
      while (c < nlist) {
        if (!taken(c) && sims(c) > bestScore) { bestScore = sims(c); best = c }
        c += 1
      }
      taken(best) = true
      out(i) = best
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Nearest-centroid id (0-based) against a payload centroid matrix. */
case class BestCellExpr(child: Expression, cents: Array[Double],
                        nlist: Int, dim: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(s"best_cell requires array<double>, got ${o.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "best_cell"

  override protected def nullSafeEval(v: Any): Any =
    Centroids.bestCell(v.asInstanceOf[ArrayData], cents, nlist, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = ctx.addReferenceObj("ivfCents", cents, "double[]")
    defineCodeGen(ctx, ev, v => s"graft.functions.Centroids.bestCell($v, $c, $nlist, $dim)")
  }
  override protected def withNewChildInternal(nc: Expression): BestCellExpr =
    copy(child = nc)
}

/** Top-`probes` nearest-centroid ids (sim desc, index asc). */
case class TopCellsExpr(child: Expression, cents: Array[Double],
                        nlist: Int, dim: Int, probes: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(s"top_cells requires array<double>, got ${o.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "top_cells"

  override protected def nullSafeEval(v: Any): Any =
    Centroids.topCells(v.asInstanceOf[ArrayData], cents, nlist, dim, probes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = ctx.addReferenceObj("ivfCents", cents, "double[]")
    defineCodeGen(ctx, ev, v => s"graft.functions.Centroids.topCells($v, $c, $nlist, $dim, $probes)")
  }
  override protected def withNewChildInternal(nc: Expression): TopCellsExpr =
    copy(child = nc)
}

object CentroidFunctions {
  def best_cell(vec: Column, cents: Array[Double], nlist: Int, dim: Int): Column =
    GraftSqlBridge.column(BestCellExpr(GraftSqlBridge.expression(vec), cents, nlist, dim))
  def top_cells(vec: Column, cents: Array[Double], nlist: Int, dim: Int, probes: Int): Column =
    GraftSqlBridge.column(TopCellsExpr(GraftSqlBridge.expression(vec), cents, nlist, dim, probes))
}
