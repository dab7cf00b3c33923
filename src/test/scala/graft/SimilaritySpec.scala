package graft

import graft.ext.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine: exact on known vectors; zero-norm safe") {
    val df = Seq(
      (Seq(1.0, 0.0), Seq(0.0, 1.0)),   // orthogonal -> 0
      (Seq(1.0, 2.0), Seq(2.0, 4.0)),   // parallel -> 1
      (Seq(0.0, 0.0), Seq(1.0, 1.0)),   // zero norm -> 0
    ).toDF("a", "b").select(Similarity.cosine(col("a"), col("b")).as("c"))
    val vals = df.collect().map(_.getDouble(0))
    assert(math.abs(vals(0)) < 1e-12)
    assert(math.abs(vals(1) - 1.0) < 1e-12)
    assert(vals(2) === 0.0)
  }

  test("bruteForceTopK: rank law, self-exclusion, best-first") {
    val e = sf("sf0.001", "embeddings")
    val q = e.filter(col("vec_id") < 5)
    val top = Similarity.bruteForceTopK(q, e, "vec_id", "vec_id", "embedding", k = 3)
    val rows = top.collect()
    assert(rows.length === 5 * 3)
    assert(rows.forall(r => r.getLong(0) != r.getLong(1))) // no self
    // ranks 1..3 per qid, sims non-increasing
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(2))
      assert(sorted.map(_.getInt(2)).toSeq === Seq(1, 2, 3))
      assert(sorted.sliding(2).forall(p => p(0).getDouble(3) >= p(1).getDouble(3)))
    }
  }

  test("annTopK: high recall on planted near-duplicate clusters") {
    // clustered data (LSH's actual use case): 30 bases, each with a close
    // perturbation; query = perturbed, expected top-1 = its base.
    val dim = 16
    val rnd = new scala.util.Random(7)
    val bases = (0 until 30).map { i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat).toSeq)
    }
    val probes = bases.map { case (id, v) =>
      (id + 1000L, v.map(x => x + 0.02f * rnd.nextGaussian().toFloat))
    }
    val corpus = bases.toDF("vec_id", "embedding")
    val queries = probes.toDF("vec_id", "embedding")
    val ann = Similarity.annTopK(queries, corpus, "vec_id", "vec_id", "embedding",
      dim = dim, k = 1, tables = 8, bits = 8)
    val hits = ann.filter(col("rank") === 1 && col("nid") === col("qid") - 1000).count()
    assert(hits >= 27, s"ANN top-1 recall too low: $hits/30")
  }

  test("multiprobe LSH: recall strictly improves over single-probe at equal budget") {
    val dim = 16
    val rnd = new scala.util.Random(11)
    val bases = (0 until 40).map { i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat).toSeq)
    }
    // looser perturbation than the annTopK test so single-probe misses some
    val probes = bases.map { case (id, v) =>
      (id + 1000L, v.map(x => x + 0.15f * rnd.nextGaussian().toFloat))
    }
    val corpus = bases.toDF("vec_id", "embedding")
    val queries = probes.toDF("vec_id", "embedding")
    def recall(mp: Boolean): Long =
      Similarity.annTopK(queries, corpus, "vec_id", "vec_id", "embedding",
          dim = dim, k = 1, tables = 2, bits = 10, multiprobe = mp)
        .filter(col("rank") === 1 && col("nid") === col("qid") - 1000).count()
    val single = recall(mp = false)
    val multi = recall(mp = true)
    assert(multi >= single, s"multiprobe $multi < single $single")
    assert(multi >= 35, s"multiprobe top-1 recall too low: $multi/40")
  }

  test("ivfTopK: recall against brute force on real embeddings") {
    val e = sf("sf0.001", "embeddings")
    val q = e.filter(col("vec_id") < 20)
    val brute = Similarity.bruteForceTopK(q, e, "vec_id", "vec_id", "embedding", k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ivf = Similarity.ivfTopK(q, e, "vec_id", "vec_id", "embedding",
        k = 1, nlist = 8, nprobe = 8) // nprobe = nlist => exhaustive => exact
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ivf === brute, "nprobe=nlist IVF must equal brute force")
    val ivfPartial = Similarity.ivfTopK(q, e, "vec_id", "vec_id", "embedding",
        k = 1, nlist = 8, nprobe = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val recall = brute.count { case (k2, v) => ivfPartial.get(k2).contains(v) }
    assert(recall >= 8, s"IVF nprobe=4/8 top-1 recall too low: $recall/20")
  }

  test("cosineNearDups agrees with brute pair filter") {
    val e = sf("sf0.001", "embeddings").limit(100)
    val nd = Similarity.cosineNearDups(e, "vec_id", "embedding", threshold = 0.3)
    val rows = nd.collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(_.getDouble(2) >= 0.3))
  }
}
