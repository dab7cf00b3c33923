package graft.ext

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.ml.linalg.{DenseVector, SparseVector, Vector}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Trained quality filtering: a logistic-regression classifier over hashed
 * word n-gram features that separates a REFERENCE-QUALITY seed corpus from
 * ordinary/noisy text — the learnable complement of the heuristic
 * [[TextAnalysis.qualityScore]] (the GPT-3/CCNet-style pipeline stage:
 * score every crawl document by its probability of "looking like" the
 * curated seed, keep high scorers or importance-sample on the score).
 *
 * Spark-first shape:
 *  - featurization is one declarative pass — lowercased whitespace tokens
 *    plus bigrams, hashed into a fixed-dim term-frequency `SparseVector`
 *    by Spark ML's `HashingTF` (murmur3, fixed seed → the SAME text
 *    featurizes identically at train and score time, on any cluster);
 *  - training fits `org.apache.spark.ml.classification.LogisticRegression`
 *    on the labeled union (distributed L-BFGS: per-iteration gradient is
 *    one treeAggregate over the executors — no driver-side feature
 *    matrices), then strips the fitted model down to a PORTABLE
 *    [[QualityModel]] (dim, intercept, sparse weights) that persists as a
 *    single JSON artifact next to the corpus, like `bpe_model.json`;
 *  - scoring is map-only: the weight vector broadcasts once per executor
 *    (≤ dim doubles; 0.5 MB at the 2^16 default) and each document costs
 *    one hash pass + one sparse dot — no shuffle, no model server.
 *
 * At 100 TB: train on bounded seeds (positive = curated reference pages,
 * negative = a corpus sample — caller controls both sizes), score the
 * full corpus map-only. Reference scope: the reference engine has no
 * model stage; this extends its transform family the way a pretraining
 * pipeline needs (quality gate before dedup/tokenize).
 */
object QualityClassifier {

  /** Shared train/score featurization: `_features` = hashed TF vector of
    * unigrams + bigrams. Deterministic (murmur3 with HashingTF's fixed
    * seed) and null-safe (null text featurizes as empty; callers decide
    * whether to filter or null the score). */
  private def withFeatures(df: DataFrame, textCol: String, dim: Int): DataFrame = {
    val withTerms = df
      .withColumn("_toks", split(lower(trim(coalesce(col(textCol), lit("")))), "\\s+"))
      .withColumn("_terms", concat(col("_toks"),
        when(size(col("_toks")) >= 2, expr(
          "transform(sequence(0, size(_toks) - 2), i -> concat(_toks[i], ' ', _toks[i+1]))"))
          .otherwise(expr("cast(array() as array<string>)"))))
      .drop("_toks")
    new HashingTF().setInputCol("_terms").setOutputCol("_features")
      .setNumFeatures(dim).transform(withTerms).drop("_terms")
  }

  /**
   * Fit the classifier: `positive` = reference-quality documents (label 1),
   * `negative` = ordinary/noisy documents (label 0). Both frames only need
   * `textCol`. L2-regularized so weights stay dense-bounded and the
   * decision is smooth under near-duplicate features.
   */
  def train(positive: DataFrame, negative: DataFrame, textCol: String,
            dim: Int = 1 << 16, regParam: Double = 1e-4,
            maxIter: Int = 50): QualityModel = {
    val labeled = positive.select(col(textCol)).withColumn("label", lit(1.0))
      .unionByName(negative.select(col(textCol)).withColumn("label", lit(0.0)))
      .filter(col(textCol).isNotNull)
    val feats = withFeatures(labeled, textCol, dim)
    val lr = new LogisticRegression()
      .setFeaturesCol("_features").setLabelCol("label")
      .setRegParam(regParam).setMaxIter(maxIter).setStandardization(false)
    val m = lr.fit(feats)
    val (idx, w) = m.coefficients match {
      case sv: SparseVector => (sv.indices, sv.values)
      case dv: DenseVector =>
        val nz = dv.values.zipWithIndex.filter(_._1 != 0.0)
        (nz.map(_._2), nz.map(_._1))
    }
    QualityModel(dim, m.intercept, idx, w)
  }

  /** Map-only scoring: adds `outCol` = P(document ~ positive seed) in
    * (0,1); null text scores null. The model rides one broadcast. */
  def score(df: DataFrame, textCol: String, model: QualityModel,
            outCol: String = "quality_prob"): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(model)
    val f = udf((v: Vector) =>
      if (v == null) null.asInstanceOf[java.lang.Double]
      else java.lang.Double.valueOf(bc.value.prob(v)))
    withFeatures(df, textCol, model.dim)
      .withColumn(outCol,
        when(col(textCol).isNull, lit(null).cast("double"))
          .otherwise(f(col("_features"))))
      .drop("_features")
  }

  /**
   * GPT-3-style importance sampling over a quality score (the published
   * alternative to a hard threshold: GPT-3 appendix A kept a crawl
   * document when `np.random.pareto(alpha) > 1 - document_score`,
   * alpha = 9) — high scorers are near-certain keeps while low scorers
   * survive with probability `(2 - s)^(-alpha)`, a smooth tail of
   * ordinary text instead of a cliff at the threshold.
   *
   * DETERMINISTIC and PORTABLE where numpy's RNG is neither: the Pareto
   * draw is the inverse-CDF transform `(1-u)^(-1/alpha) - 1` of a
   * uniform built from `md5("<seed>:<id>")` (the same portable-hash
   * argument as [[Packing.shardSequences]] / its q77 oracle — any engine
   * recomputes the identical keep set, bit for bit). Consequences: a
   * replayed streaming batch keeps exactly the docs it first kept, a
   * re-run pipeline is reproducible, and the keep decision is
   * oracle-checkable. Map-only; `seed` gives independent resamples.
   */
  def paretoSample(df: DataFrame, idCol: String, scoreCol: String,
                   alpha: Double = 9.0, seed: Long = 0L): DataFrame = {
    require(alpha > 0, s"alpha must be positive, got $alpha")
    // 13 hex chars = 52 bits: exactly representable in a double, so the
    // uniform (v / 2^52) is the same value on every engine
    val u = conv(substring(md5(concat_ws(":",
        lit(seed), col(idCol).cast("string"))), 1, 13), 16, 10)
      .cast("double") / math.pow(2, 52)
    val draw = pow(lit(1.0) - u, lit(-1.0 / alpha)) - lit(1.0)
    df.filter(col(scoreCol).isNotNull && draw > lit(1.0) - col(scoreCol))
  }

  /** Persist as a single JSON artifact (any Hadoop FS), like the BPE
    * model: `{"dim":...,"intercept":...,"idx":[...],"w":[...]}`. */
  def save(spark: org.apache.spark.sql.SparkSession, model: QualityModel,
           path: String): Unit = {
    val sb = new StringBuilder
    sb.append("{\"dim\":").append(model.dim)
      .append(",\"intercept\":").append(model.intercept)
      .append(",\"idx\":[").append(model.indices.mkString(","))
      .append("],\"w\":[").append(model.weights.mkString(","))
      .append("]}")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(path), true)
    out.write(sb.toString.getBytes("UTF-8")); out.close()
  }

  def load(spark: org.apache.spark.sql.SparkSession, path: String): QualityModel = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new org.apache.hadoop.fs.Path(path))
    val json = new String(in.readAllBytes(), "UTF-8"); in.close()
    // real JSON parse (Jackson ships with Spark) — tolerates whitespace,
    // key reorder, pretty-printing, external producers
    val root =
      try new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
      catch { case e: Exception => throw new IllegalArgumentException(
        s"quality model at $path is not valid JSON: ${e.getMessage}", e) }
    def req(key: String): com.fasterxml.jackson.databind.JsonNode = {
      val n = root.get(key)
      require(n != null && !n.isNull, s"quality model missing $key: $path")
      n
    }
    def arr(key: String): com.fasterxml.jackson.databind.JsonNode = {
      val n = req(key)
      require(n.isArray, s"quality model $key must be an array: $path")
      n
    }
    val idxN = arr("idx"); val wN = arr("w")
    QualityModel(req("dim").asInt, req("intercept").asDouble,
      Array.tabulate(idxN.size)(i => idxN.get(i).asInt),
      Array.tabulate(wN.size)(i => wN.get(i).asDouble))
  }
}

/** Portable fitted quality classifier: sparse weights over the hashed
  * feature space. `prob` rebuilds a dense weight array lazily once per
  * executor (≤ dim doubles) so each document is one sparse dot. */
case class QualityModel(dim: Int, intercept: Double,
                        indices: Array[Int], weights: Array[Double])
  extends Serializable {
  require(indices.length == weights.length,
    s"${indices.length} indices vs ${weights.length} weights")

  @transient private lazy val dense: Array[Double] = {
    val a = new Array[Double](dim)
    var i = 0
    while (i < indices.length) { a(indices(i)) = weights(i); i += 1 }
    a
  }

  def prob(v: Vector): Double = {
    var margin = intercept
    v.foreachActive { (i, x) => margin += dense(i) * x }
    1.0 / (1.0 + math.exp(-margin))
  }
}
