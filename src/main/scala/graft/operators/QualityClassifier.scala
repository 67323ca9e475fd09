package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** GPT-3-style corpus quality classifier: train a logistic-regression
  * filter on labeled seed corpora (positive = curated/high-quality,
  * negative = raw crawl), then score every raw document and keep those
  * resembling the positive class — the recipe behind the GPT-3/LLaMA
  * "quality classifier" filtering stage (Brown et al. 2020 §A;
  * fasttext-style linear model over cheap text features).
  *
  * Complements the battery's intrinsic filters: Gopher rules and the
  * quality-score blend judge a document on its own; DSIR matches a
  * target distribution generatively; THIS operator learns a
  * discriminative boundary from labeled seeds.
  *
  * Scale/determinism shape (the `Knn.trainCentroids` pattern):
  *  - FEATURES are pure Column arithmetic over integer counts (code
  *    points, regex character-class counts, token counts) — map-side,
  *    codegen, no UDF, and bit-replicable in straight-line JVM code.
  *  - TRAINING runs DRIVER-SIDE on a bounded deterministic sample
  *    (md5-hash selected, ≤ sampleCap rows per class, ascending-id fold
  *    order, fixed iterations/learning rate, zero init): a distributed
  *    gradient sum would merge float partials in nondeterministic order
  *    (the exact hazard that kept q42/q46/q49 off the oracle surface),
  *    and a 100 TB corpus never trains the seed model anyway — seeds
  *    are curated and bounded by construction.
  *  - SCORING is one map-side projection: z folds the weights in fixed
  *    feature order, score_e6 = (sigmoid(z)·1e6 + 0.5)::long, keep is
  *    an integer compare — the whole corpus pass is deterministic, so
  *    q140 is DuckDB-oracle-able via the `QualityMirror` VALUES replay.
  */
object QualityClassifier {

  /** Feature names in model order (bias prepended internally). */
  val FeatureNames: Seq[String] = Seq(
    "f_log_tokens", "f_type_token", "f_punct", "f_digit", "f_chars_per_token")

  /** Feature struct for one text column — every field a double derived
    * from integer counts (exact in any engine) except the single `ln`.
    * Null text is treated as empty. */
  def featureCols(text: Column): Column = {
    val t = coalesce(text, lit(""))
    val toks = split(trim(t), "\\s+")
    val nToks = size(toks).cast("double")
    val nDistinct = size(array_distinct(toks)).cast("double")
    val nChars = length(t).cast("double")
    val nPunct = length(regexp_replace(t, "[^\\p{Punct}]", "")).cast("double")
    val nDigit = length(regexp_replace(t, "[^0-9]", "")).cast("double")
    struct(
      log(lit(1.0) + nToks).as("f_log_tokens"),
      (nDistinct / greatest(nToks, lit(1.0))).as("f_type_token"),
      (nPunct / greatest(nChars, lit(1.0))).as("f_punct"),
      (nDigit / greatest(nChars, lit(1.0))).as("f_digit"),
      (nChars / greatest(nToks, lit(1.0)) / lit(10.0)).as("f_chars_per_token"))
  }

  /** Deterministic bounded sample of (id, features) for one class:
    * md5-hash membership when the class exceeds `sampleCap` (the
    * `Sampling.hashSample` contract), ascending id. */
  private def sampleFeatures(df: DataFrame, idCol: String, textCol: String,
      sampleCap: Int): Array[(Long, Array[Double])] = {
    val n = df.count()
    val dSample =
      if (n <= sampleCap) df
      else Sampling.hashSample(df, idCol, sampleCap.toDouble / n)
    dSample
      .select(col(idCol).cast("long").as("id"), featureCols(col(textCol)).as("f"))
      .select(col("id"), col("f.*"))
      .collect()
      .map(r => (r.getLong(0), FeatureNames.indices.map(i => r.getDouble(i + 1)).toArray))
      .sortBy(_._1)
  }

  /** Train logistic regression on the two seed classes. Returns weights
    * (bias first, then [[FeatureNames]] order). Fully deterministic:
    * bounded samples, positive-then-negative ascending-id fold, zero
    * init, full-batch gradient descent with fixed lr/iterations. */
  def train(pos: DataFrame, neg: DataFrame, idCol: String, textCol: String,
      sampleCap: Int = 2000, iterations: Int = 200,
      learningRate: Double = 0.5): Array[Double] = {
    require(sampleCap >= 1 && iterations >= 1 && learningRate > 0.0,
      "sampleCap/iterations must be >= 1 and learningRate > 0")
    val posRows = sampleFeatures(pos, idCol, textCol, sampleCap)
    val negRows = sampleFeatures(neg, idCol, textCol, sampleCap)
    // loud failure, not a degenerate single-class model: an empty seed
    // class (typo'd label, over-filtered source) would otherwise train a
    // constant classifier that silently drops (or keeps) the WHOLE corpus
    require(posRows.nonEmpty && negRows.nonEmpty,
      s"both seed classes must be non-empty (pos=${posRows.length}, neg=${negRows.length})")
    val rows = posRows.map(r => (r._2, 1.0)) ++ negRows.map(r => (r._2, 0.0))
    val d = FeatureNames.length
    val w = new Array[Double](d + 1) // bias at 0
    val invN = 1.0 / rows.length
    var iter = 0
    while (iter < iterations) {
      val g = new Array[Double](d + 1)
      rows.foreach { case (x, y) =>
        var z = w(0)
        var k = 0
        while (k < d) { z += w(k + 1) * x(k); k += 1 }
        val p = 1.0 / (1.0 + math.exp(-z))
        val err = p - y
        g(0) += err
        k = 0
        while (k < d) { g(k + 1) += err * x(k); k += 1 }
      }
      var k = 0
      while (k <= d) { w(k) -= learningRate * invN * g(k); k += 1 }
      iter += 1
    }
    w
  }

  /** Score every row map-side with a trained weight vector: z folds the
    * weights in fixed feature order, `score_e6 = (sigmoid(z)·1e6 +
    * 0.5)::long`, `keep = score_e6 >= τ·1e6` (integer compare).
    * Output: (idCol, score_e6, keep). */
  def score(df: DataFrame, idCol: String, textCol: String,
      weights: Array[Double], tau: Double = 0.5): DataFrame = {
    require(weights.length == FeatureNames.length + 1,
      s"need ${FeatureNames.length + 1} weights (bias first), got ${weights.length}")
    val f = featureCols(col(textCol))
    val z = FeatureNames.zipWithIndex.foldLeft(lit(weights(0)): Column) {
      case (acc, (name, k)) => acc + lit(weights(k + 1)) * f(name)
    }
    val sigmoid = lit(1.0) / (lit(1.0) + exp(-z))
    df.select(col(idCol),
        (sigmoid * lit(1e6) + lit(0.5)).cast("long").as("score_e6"))
      .withColumn("keep", col("score_e6") >= lit((tau * 1e6).toLong))
  }

  /** Train on the seeds, score the whole corpus. */
  def trainAndScore(raw: DataFrame, pos: DataFrame, neg: DataFrame,
      idCol: String, textCol: String, tau: Double = 0.5,
      sampleCap: Int = 2000, iterations: Int = 200,
      learningRate: Double = 0.5): DataFrame =
    score(raw, idCol, textCol,
      train(pos, neg, idCol, textCol, sampleCap, iterations, learningRate), tau)
}
