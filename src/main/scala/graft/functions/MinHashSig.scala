package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * One-pass MinHash signature over an array of 64-bit element hashes.
 *
 * Family: h_i(x) = (a_i * x32 + b_i) mod P, P = first prime > 2^32,
 * x32 = x & 0xffffffff, a_i in [1, 2^30), b_i in [0, 2^31) — long-overflow
 * free and a genuine pseudo-permutation (see Dedup.minhashSignature, whose
 * HOF formulation this replaces: 32 interpreted array traversals become one
 * codegen'd nested loop).
 */
object MinHashSig {
  val Prime = 4294967311L // first prime > 2^32

  /** Deterministic (a, b) per hash index; identical to Dedup.perm. */
  def seeds(numHashes: Int): Array[Long] = {
    val out = new Array[Long](numHashes * 2)
    var i = 0
    while (i < numHashes) {
      val r = new scala.util.Random(i * 2654435761L)
      out(i * 2) = r.nextInt((1 << 30) - 1).toLong + 1L
      out(i * 2 + 1) = r.nextInt(Int.MaxValue).toLong
      i += 1
    }
    out
  }

  private val seedCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()
  def cachedSeeds(numHashes: Int): Array[Long] =
    seedCache.computeIfAbsent(numHashes, seeds(_))

  def compute(hashes: ArrayData, numHashes: Int): ArrayData = {
    val ab = cachedSeeds(numHashes)
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = hashes.numElements()
    var j = 0
    while (j < n) {
      if (!hashes.isNullAt(j)) {
        val x32 = hashes.getLong(j) & 0xFFFFFFFFL
        var i = 0
        while (i < numHashes) {
          val v = (ab(i * 2) * x32 + ab(i * 2 + 1)) % Prime
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins)
  }
}

case class MinHashSigExpr(child: Expression, numHashes: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<bigint>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashSig.compute($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}
