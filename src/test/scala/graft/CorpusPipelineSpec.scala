package graft

import graft.pipeline.CorpusPipeline
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("stages drop exactly the planted junk, exact clones, and near-clones") {
    val rnd = new scala.util.Random(31)
    def sentence(n: Int) =
      (0 until n).map(_ => s"the w${rnd.nextInt(400)} of and to a").mkString(" ")
    val clean = (0L until 40L).map(i => (i, "src", sentence(12)))
    val junk = (100L until 110L).map(i => (i, "src", "x"))           // fails quality
    val exactClones = clean.take(5).map { case (i, s, t) => (i + 200L, s, t) }
    val nearClones = clean.slice(5, 10).map { case (i, s, t) =>
      (i + 300L, s, t + " zzz") }                                    // high jaccard
    val input = Files.createTempDirectory("graft-cp-in").toString
    (clean ++ junk ++ exactClones ++ nearClones)
      .toDF("doc_id", "source", "text").write.mode("overwrite").parquet(input)

    val out = Files.createTempDirectory("graft-cp-out").toString
    val st = CorpusPipeline.run(spark, input, out, "corpus",
      numShards = 3, partitionMultiples = 2, qualityMin = 0.3,
      nearDupThreshold = 0.8, bpeMerges = 60, bpeMaxWords = 2000)

    assert(st.input === 60L)
    assert(st.afterQuality === 50L, s"junk not filtered: $st")       // -10 junk
    assert(st.afterExact === 45L, s"exact clones not dropped: $st")  // -5 clones
    assert(st.afterNearDup === 40L, s"near clones not dropped: $st") // -5 near
    assert(st.totalTokens > 0)
    assert(st.bundle.totalDocs === 40L)

    // bundle is columnar with token columns + vocab_fit; model persisted
    val back = spark.read.parquet(s"$out/corpus/data")
    assert(back.columns.contains("bpe_token_cnt") && back.columns.contains("vocab_fit"))
    assert(back.agg(sum("bpe_token_cnt")).head().getLong(0) === st.totalTokens)
    assert(Files.exists(Paths.get(s"$out/corpus/bpe_model.json")))
    // surviving ids are exactly the 40 originals (canonical-minimum law)
    val ids = back.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids === (0L until 40L).toSet)
  }
}
