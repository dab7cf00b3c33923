package graft

import graft.functions.{EsFunctions, EsMurmur3}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

class EsMurmur3Spec extends SparkSpec {

  // Vectors computed with an independent pure-Python murmur3_x86_32
  // implementation (itself validated against published test vectors:
  // mmh3("hello")=613153351, mmh3("foo")=-156908512, mmh3("The quick brown
  // fox jumps over the lazy dog")=776992547) applied to UTF-16LE bytes,
  // seed 0 — the ES routing scheme (reference Murmur3HashFunction.java:14-29).
  val vectors: Seq[(String, Int)] = Seq(
    "" -> 0,
    "0" -> 384918240,
    "1" -> -126235597,
    "2" -> -303927213,
    "3" -> -1151172406,
    "4" -> -1265741853,
    "5" -> -1501624929,
    "6" -> -1677976503,
    "7" -> -1167431322,
    "8" -> 735335986,
    "9" -> 824610026,
    "a" -> 1867108634,
    "abc" -> 1118836419,
    "hello" -> -675079799,
    "routing-key-42" -> -773018261,
    "ключ" -> -497090284,
    "中文路由" -> 440426073,
    "emoji😀x" -> 288786761,
  )

  test("hashChars matches independently-computed ES routing vectors") {
    for ((s, expected) <- vectors)
      assert(EsMurmur3.hashChars(s) === expected, s"input '$s'")
  }

  test("shard: floorMod semantics and null->0") {
    assert(EsMurmur3.shard(null, 5) === 0)
    assert(EsMurmur3.shard("", 5) === 0)
    assert(EsMurmur3.shard("1", 3) === 2)  // -126235597 floorMod 3
    assert(EsMurmur3.shard("3", 5) === 4)  // -1151172406 floorMod 5
  }

  test("es_hash expression evaluates via codegen and matches scala impl") {
    import spark.implicits._
    val df = vectors.map(_._1).toDF("s")
      .withColumn("h", EsFunctions.es_hash(col("s")))
    val got = df.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    for ((s, expected) <- vectors) assert(got(s) === expected, s"input '$s'")
  }

  test("es_shard column: range law and null handling") {
    import spark.implicits._
    val df = (vectors.map(_._1) :+ null).toDF("s")
      .withColumn("shard", EsFunctions.es_shard(col("s"), 7))
    val shards = df.collect().map(_.getInt(1))
    assert(shards.forall(p => p >= 0 && p < 7))
    // null routing -> shard 0
    val nullShard = df.filter(col("s").isNull).collect().head.getInt(1)
    assert(nullShard === 0)
  }

  test("property: shard in [0,n) and equals mod-of-hash; fanout consistency") {
    val prop = Prop.forAll(Gen.asciiPrintableStr, Gen.choose(1, 64)) { (s: String, n: Int) =>
      val p = EsMurmur3.shard(s, n)
      // fan-out law (SURVEY.md X3): partition mod numShards == shard
      val fanout = EsMurmur3.shard(s, n * 10)
      p >= 0 && p < n && fanout % n == p
    }
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop).passed)
  }

  test("es_hash registered in SQL") {
    EsFunctions.register(spark)
    val r = spark.sql("SELECT es_hash('hello') AS h").collect().head.getInt(0)
    assert(r === -675079799)
  }
}
