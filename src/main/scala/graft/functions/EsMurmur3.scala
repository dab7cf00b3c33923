package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Elasticsearch-compatible routing hash: murmur3_x86_32 (Austin Appleby's
 * public-domain algorithm) computed over the UTF-16LE byte encoding of the
 * routing string, seed 0 — bit-identical to ES >= 2.0 shard routing.
 *
 * Reference behavior: `Murmur3HashFunction.java:14-29` feeds each Java char
 * of the routing string as two little-endian bytes into Lucene's
 * `murmurhash3_x86_32` with seed 0. Spark's builtin `hash()` is murmur3 too
 * but with seed 42 over UTF-8 bytes, so it is NOT placement-compatible; this
 * custom expression is required for shard-exact routing (SURVEY.md X2).
 *
 * Because each char contributes exactly 2 bytes, we can consume the string
 * two chars (one 4-byte block) at a time without materializing a byte array.
 */
object EsMurmur3 {
  private final val C1 = 0xcc9e2d51
  private final val C2 = 0x1b873593

  /** murmur3_x86_32(UTF-16LE bytes of s, seed 0). */
  def hashString(s: UTF8String): Int = hashChars(s.toString)

  def hashChars(s: String): Int = {
    val len = s.length
    val nblocks = len >> 1
    var h1 = 0
    var i = 0
    while (i < nblocks) {
      // block = charLo(2 bytes LE) ++ charHi(2 bytes LE), read little-endian
      var k1 = (s.charAt(i << 1) & 0xffff) | ((s.charAt((i << 1) + 1) & 0xffff) << 16)
      k1 *= C1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= C2
      h1 ^= k1
      h1 = Integer.rotateLeft(h1, 13)
      h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    if ((len & 1) == 1) { // 2-byte tail: the last lone char
      var k1 = s.charAt(len - 1) & 0xffff
      k1 *= C1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= C2
      h1 ^= k1
    }
    h1 ^= len << 1 // total byte length
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  /** Shard id with the reference partitioner's null->0 rule
    * (`ESHashPartitioner.scala:15-19`). Note hash("") == 0, so routing null
    * and routing "" both land on shard 0, exactly like the reference. */
  def shard(routing: String, numShards: Int): Int =
    if (routing == null) 0 else Math.floorMod(hashChars(routing), numShards)
}

/** Catalyst expression wrapper with whole-stage codegen support. */
case class EsHash(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"es_hash requires a string argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "es_hash"

  override protected def nullSafeEval(input: Any): Any =
    EsMurmur3.hashString(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.EsMurmur3.hashChars($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): EsHash = copy(newChild)
}

object EsFunctions {
  /** ES routing hash of a string column (null in, null out). */
  def es_hash(c: Column): Column = GraftSqlBridge.column(EsHash(GraftSqlBridge.expression(c)))

  /** Shard id in [0, numShards): floorMod(es_hash, n), null routing -> shard 0
    * (hash("") == 0). Composes from codegen'd builtins so it stays inside
    * WholeStageCodegen. */
  def es_shard(routing: Column, numShards: Int): Column =
    pmod(es_hash(coalesce(routing, lit(""))), lit(numShards))

  /** Fan-out partition id in [0, numShards*multiples): the reference's
    * ESHashPartitioner law (`partition = mod(hash, n*m)`), which still maps
    * each row to its shard because (h mod nm) mod n == h mod n. Partitioning
    * on the shard id itself would collapse the exchange to <= n non-empty
    * partitions, defeating the write fan-out. */
  def es_partition(routing: Column, numShards: Int, multiples: Int): Column =
    pmod(es_hash(coalesce(routing, lit(""))), lit(numShards * multiples))

  /** SimHash of an array<long> of token hashes (see [[SimHash64]]). */
  def simhash64(c: Column): Column =
    GraftSqlBridge.column(SimHash64Expr(GraftSqlBridge.expression(c)))

  /** One-pass distinct word-k-shingle hashes (see [[ShingleHashes]]). */
  def shingle_hashes(text: Column, k: Int): Column =
    GraftSqlBridge.column(ShingleHashesExpr(GraftSqlBridge.expression(text), k))

  /** Positional (non-distinct) k-word window hashes (see [[WindowHashes]]). */
  def window_hashes(text: Column, k: Int): Column =
    GraftSqlBridge.column(WindowHashesExpr(GraftSqlBridge.expression(text), k))

  /** One-pass per-doc term postings entries (see [[TermPostings]]). */
  def term_postings(text: Column, positional: Boolean): Column =
    GraftSqlBridge.column(
      TermPostingsExpr(GraftSqlBridge.expression(text), positional))

  /** One-pass per-doc phrase-prefix stats (see [[PhrasePrefixStats]]). */
  def phrase_prefix_stats(text: Column, fixed: Seq[String],
                          prefix: String): Column =
    GraftSqlBridge.column(
      PhrasePrefixStatsExpr(GraftSqlBridge.expression(text), fixed, prefix))

  /** One-pass codegen'd MinHash signature (see [[MinHashSig]]). */
  def minhash_sig(hashes: Column, numHashes: Int): Column =
    GraftSqlBridge.column(MinHashSigExpr(GraftSqlBridge.expression(hashes), numHashes))

  /** Jaccard of two sorted distinct array<long> columns (see [[JaccardSorted]]). */
  def jaccard_sorted(a: Column, b: Column): Column =
    GraftSqlBridge.column(JaccardSortedExpr(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Codegen'd dot product of two array<double> columns (see [[DotProduct]]). */
  def dot_product(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProductExpr(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** One-pass unit-vector normalization, array<float|double> -> array<double>
    * (see [[UnitVec]]). */
  def unit_vec(v: Column): Column =
    GraftSqlBridge.column(UnitVecExpr(GraftSqlBridge.expression(v)))

  /** One-pass normalized char n-grams (see [[CharNgrams]]). */
  def char_ngrams(text: Column, n: Int): Column =
    GraftSqlBridge.column(CharNgramsExpr(GraftSqlBridge.expression(text), n))

  /** Hyperplane-LSH signature with a payload plane matrix (see [[LshPlanes]]). */
  def lsh_sig(v: Column, planes: Array[Double], bits: Int, dim: Int): Column =
    GraftSqlBridge.column(LshSigExpr(GraftSqlBridge.expression(v), planes, bits, dim))

  /** Per-bit hyperplane dots (multiprobe margins; see [[LshPlanes]]). */
  def lsh_plane_dots(v: Column, planes: Array[Double], bits: Int, dim: Int): Column =
    GraftSqlBridge.column(LshPlaneDotsExpr(GraftSqlBridge.expression(v), planes, bits, dim))

  /** Register custom expressions for SQL use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    // int-literal arguments (hash counts, shingle k) must fold at plan time
    def intArg(e: org.apache.spark.sql.catalyst.expressions.Expression,
               name: String): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$name expects a literal int, got $other")
    }
    reg.createOrReplaceTempFunction(
      "es_hash", exprs => EsHash(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64Expr(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "dot_product", exprs => DotProductExpr(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "unit_vec", exprs => UnitVecExpr(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "jaccard_sorted", exprs => JaccardSortedExpr(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "text_stats", exprs => TextStatsExpr(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "shingle_hashes",
      exprs => ShingleHashesExpr(exprs(0), intArg(exprs(1), "shingle_hashes(k)")),
      "built-in")
    reg.createOrReplaceTempFunction(
      "window_hashes",
      exprs => WindowHashesExpr(exprs(0), intArg(exprs(1), "window_hashes(k)")),
      "built-in")
    reg.createOrReplaceTempFunction(
      "minhash_sig",
      exprs => MinHashSigExpr(exprs(0), intArg(exprs(1), "minhash_sig(numHashes)")),
      "built-in")
    reg.createOrReplaceTempFunction(
      "minhash_sketch",
      exprs => MinHashSketchAgg(exprs(0),
        intArg(exprs(1), "minhash_sketch(numHashes)")).toAggregateExpression(),
      "built-in")
    reg.createOrReplaceTempFunction(
      "vector_sum", exprs => VectorSumAgg(exprs.head).toAggregateExpression(),
      "built-in")
    reg.createOrReplaceTempFunction(
      "count_by_key", exprs => CountByKeyAgg(exprs.head).toAggregateExpression(),
      "built-in")
  }
}
