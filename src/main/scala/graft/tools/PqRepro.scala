package graft.tools

import graft.ext.Similarity
import org.apache.spark.sql.functions._

/** Diagnostic: reproduce the driver-bench clustered PQ recall (round-1
  * driver run reported 0.48 vs the builder-recorded 1.0). Builds the exact
  * Bench corpus and sweeps balance on/off, two repetitions each, so
  * nondeterminism vs genuine regression is visible in one run. */
object PqRepro {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get("graft-pq-repro")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val dim = 64
    val centers = Array.fill(100)(Array.fill(dim)(rnd.nextGaussian()))
    val rows = (0 until 10000).map { i =>
      val c = centers(i % 100)
      (i.toLong, c.map(x => (x + 0.15 * rnd.nextGaussian()).toFloat).toSeq)
    }
    val emb = rows.toDF("vec_id", "embedding").repartition(32).cache()
    emb.count()
    val queries = emb.filter(col("vec_id") % 100 < 1)
    def top1(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.filter(col("rank") === 1).select("qid", "nid").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val truth = top1(Similarity.bruteForceTopK(queries, emb, "vec_id", "vec_id", "embedding", k = 1))
    def recall(got: Map[Long, Long]): Double =
      truth.count { case (k, v) => got.get(k).contains(v) }.toDouble / truth.size
    for (balance <- Seq(true, false); rep <- 1 to 2) {
      val model = Similarity.pqTrain(emb, "embedding", dim, m = 8, k = 16, balance = balance)
      val r = recall(top1(Similarity.pqTopKRerank(queries, emb,
        Similarity.pqEncode(emb, "vec_id", "embedding", model),
        "vec_id", "vec_id", "embedding", model, k = 1)))
      val rIvf = recall(top1(Similarity.ivfPqTopK(queries, emb, "vec_id", "vec_id",
        "embedding", model, k = 1, nlist = 50, nprobe = 12)))
      println(f"PQREPRO balance=$balance rep=$rep pq_rerank=$r%.3f ivf_pq=$rIvf%.3f")
    }
    spark.stop()
  }
}
