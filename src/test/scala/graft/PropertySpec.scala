package graft

import graft.ext.{Bpe, BpeModel}
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based laws (ScalaCheck) for driver-side kernels — the pieces
  * whose correctness is algebraic rather than example-shaped. */
class PropertySpec extends SparkSpec {

  private def check(prop: Prop, n: Int = 100): Unit =
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop).passed)

  val word: Gen[String] = Gen.chooseNum(1, 12).flatMap(n =>
    Gen.listOfN(n, Gen.oneOf(Gen.alphaChar, Gen.oneOf('ü', 'ß', '中', '文', '€'))))
    .map(_.mkString)

  val corpusGen: Gen[List[String]] =
    Gen.chooseNum(1, 30).flatMap(n => Gen.listOfN(n,
      Gen.chooseNum(1, 8).flatMap(w => Gen.listOfN(w, word).map(_.mkString(" ")))))

  test("BPE: encodeWord round-trips every unicode word under every model") {
    check(Prop.forAll(corpusGen, word) { (corpus, w) =>
      val wc = corpus.flatMap(_.split("\\s+")).filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      val model = Bpe.trainFromWordCounts(wc, numMerges = 20)
      w.isEmpty || model.encodeWord(w).mkString("") == w + Bpe.EOW
    })
  }

  test("BPE: more merges never increase any word's token count (monotonicity)") {
    check(Prop.forAll(corpusGen, word) { (corpus, w) =>
      val wc = corpus.flatMap(_.split("\\s+")).filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      val small = Bpe.trainFromWordCounts(wc, numMerges = 5)
      val big = Bpe.trainFromWordCounts(wc, numMerges = 25)
      w.isEmpty || big.encodeWord(w).length <= small.encodeWord(w).length
    })
  }

  test("BPE: merge-list JSON round-trip for arbitrary symbols") {
    val sym: Gen[String] = Gen.chooseNum(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('"', '\\', '<', '/', '中'))))
      .map(_.mkString)
    check(Prop.forAll(Gen.listOf(Gen.zip(sym, sym))) { merges =>
      val m = BpeModel(merges.toIndexedSeq)
      BpeModel.fromJsonMerges(m.toJsonMerges).merges == m.merges
    })
  }

  test("EsMurmur3: shard and fan-out laws over unicode routings and any n") {
    check(Prop.forAll(Gen.asciiPrintableStr.flatMap(a => word.map(a + _)),
        Gen.chooseNum(1, 1024)) { (routing, n) =>
      val s = graft.functions.EsMurmur3.shard(routing, n)
      val p = Math.floorMod(graft.functions.EsMurmur3.hashChars(routing), n * 7)
      s >= 0 && s < n && Math.floorMod(p, n) == s
    }, n = 200)
  }

  test("PQ: training deterministic, codes always bounded") {
    val vecGen = Gen.listOfN(8, Gen.chooseNum(-5.0, 5.0))
    check(Prop.forAll(Gen.chooseNum(20, 40).flatMap(n => Gen.listOfN(n, vecGen))) { vecs =>
      import spark.implicits._
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      val m1 = graft.ext.Similarity.pqTrain(df, "v", dim = 8, m = 2, k = 4, iters = 2)
      val m2 = graft.ext.Similarity.pqTrain(df, "v", dim = 8, m = 2, k = 4, iters = 2)
      val codes = graft.ext.Similarity.pqEncode(df, "id", "v", m1)
        .select("codes").collect().map(_.getSeq[Int](0))
      m1.centroids.toSeq == m2.centroids.toSeq &&
        codes.forall(cs => cs.length == 2 && cs.forall(c => c >= 0 && c < 4))
    }, n = 10) // each trial runs Spark jobs — keep the count sane
  }
}
