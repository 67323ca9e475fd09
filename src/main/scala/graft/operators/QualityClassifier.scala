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

  // ------------------------------------------------------------------
  // Hashed-n-gram variant — the feature set the papers actually deploy.
  // ------------------------------------------------------------------
  //
  // The 5 hand features above capture surface statistics; the
  // GPT-3/LLaMA/fastText-style classifier is a LINEAR MODEL OVER HASHED
  // N-GRAMS (Joulin et al. 2016, fastText; Brown et al. 2020 §A): each
  // document is a bag of unigrams+bigrams hashed into D buckets, the
  // feature vector is the normalized bucket-count vector x_b = c_b/n,
  // and a logistic regression separates the classes on VOCABULARY, not
  // just shape. Feature definition is deliberately identical to
  // [[Dsir]]'s hashed-gram generative model (`pmod(xxhash64(gram), D)`
  // over `graft_tokens` unigrams + space-joined bigrams) — one shared
  // feature space across the discriminative and generative selectors.
  //
  // Scale/determinism shape (unchanged from the 5-feature variant):
  //  - TRAINING collects a bounded SPARSE sample: per sampled doc at
  //    most min(buckets, #grams) (bucket, count) rows — the collect is
  //    capped by sampleCap·buckets regardless of corpus size — then
  //    runs the same fixed-iteration full-batch GD driver-side
  //    ([[trainSparse]], shared verbatim with the oracle mirror — the
  //    BPE `learnMerges` precedent: training is driver work even on a
  //    cluster, so sharing pins determinism, not circularity).
  //  - SCORING stays ONE shuffle-free map pass: the D bucket weights
  //    ride the plan as an array literal (~32 KB at D=4096 — far under
  //    the 1 MB Bloom-bitset precedent) and each document folds
  //    z = w0 + (Σ_g w[bucket(g)])/n left-to-right over its staged gram
  //    array with a higher-order `aggregate` — no join, no exchange,
  //    no UDF. The float fold order is the document's own gram order,
  //    so the sum is per-row deterministic under any partitioning.

  /** Unigrams + space-joined bigrams of the staged token array `ts` —
    * the [[Dsir]] feature contract. */
  def hashedGrams(ts: Column): Column =
    concat(ts, CorpusFilters.wordNGrams(ts, 2))

  /** One training row: (id, nGrams, sparse (bucket, count) pairs). */
  private type SparseRow = (Long, Long, Array[(Int, Long)])

  /** Deterministic bounded SPARSE sample of one seed class: md5-hash
    * membership above `sampleCap` (the [[Sampling.hashSample]]
    * contract), per-doc bucket counts aggregated BEFORE the collect so
    * the driver never sees more than ≈ sampleCap·buckets rows. */
  /** The shared (id, n, bucket) → count aggregation of the sparse
    * samplers — one definition so the single-class and fused two-class
    * paths provably build identical rows. */
  private def sparseAgg(df: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame = {
    val ts = CorpusFilters.words(coalesce(col(textCol), lit("")))
    df.select(col(idCol).cast("long").as("id"), ts.as("ts"))
      .select(col("id"), hashedGrams(col("ts")).as("grams"))
      .select(col("id"), size(col("grams")).as("n"),
        explode_outer(col("grams")).as("gram"))
      .select(col("id"), col("n"),
        when(col("gram").isNotNull,
          pmod(xxhash64(col("gram")), lit(buckets.toLong)).cast("int")).as("bucket"))
      .groupBy(col("id"), col("n"), col("bucket"))
      .agg(count(col("bucket")).as("c"))
  }

  private def sparseRowsOf(
      staged: Array[org.apache.spark.sql.Row]): Array[SparseRow] =
    staged
      .groupBy(r => (r.getLong(0), r.getInt(1).toLong))
      .map { case ((id, nG), rows) =>
        val sparse = rows
          .collect { case r if !r.isNullAt(2) => (r.getInt(2), r.getLong(3)) }
          .sortBy(_._1)
        (id, nG, sparse)
      }
      .toArray.sortBy(_._1)

  /** Both seed classes sampled in TWO jobs instead of four (r17
    * optimization round): one union counts both classes, one union
    * collects both staged sparse aggregations, tagged by class.
    * Per-class sampling decisions and the per-row aggregation are the
    * single-class code verbatim (same hashSample fractions on the same
    * ids, [[sparseAgg]] shared), so the training rows — and therefore
    * the weights — are bit-identical. */
  private def sampleSparseBoth(pos: DataFrame, neg: DataFrame,
      idCol: String, textCol: String, sampleCap: Int, buckets: Int)
      : (Array[SparseRow], Array[SparseRow]) = {
    val cls = "__graft_cls"
    def tag(df: DataFrame, c: Int): DataFrame =
      df.select(lit(c).as(cls), col(idCol), col(textCol))
    val counts = tag(pos, 1).unionByName(tag(neg, 0))
      .groupBy(col(cls)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val (nPos, nNeg) = (counts.getOrElse(1, 0L), counts.getOrElse(0, 0L))
    def sampled(df: DataFrame, n: Long): DataFrame =
      if (n <= sampleCap) df
      else Sampling.hashSample(df, idCol, sampleCap.toDouble / n)
    val staged = sparseAgg(sampled(pos, nPos), idCol, textCol, buckets)
      .withColumn(cls, lit(1))
      .unionByName(sparseAgg(sampled(neg, nNeg), idCol, textCol, buckets)
        .withColumn(cls, lit(0)))
      .collect()
    (sparseRowsOf(staged.filter(_.getInt(4) == 1)),
      sparseRowsOf(staged.filter(_.getInt(4) == 0)))
  }

  /** Fixed-iteration full-batch logistic GD over sparse normalized
    * bucket counts; bias at index 0, bucket b's weight at b+1. Shared
    * verbatim with [[graft.QualityMirror]] — both sides run this exact
    * driver-side loop, with determinism pinned by the spec's planted
    * vectors. */
  private[graft] def trainSparse(
      rows: Seq[(Array[(Int, Long)], Long, Double)], // (sparse, nGrams, label)
      buckets: Int, iterations: Int, learningRate: Double): Array[Double] = {
    val w = new Array[Double](buckets + 1)
    val invN = 1.0 / rows.length
    var iter = 0
    while (iter < iterations) {
      val g = new Array[Double](buckets + 1)
      rows.foreach { case (x, nG, y) =>
        val inv = if (nG > 0L) 1.0 / nG.toDouble else 0.0
        var z = w(0)
        var k = 0
        while (k < x.length) {
          z += w(x(k)._1 + 1) * (x(k)._2.toDouble * inv); k += 1
        }
        val p = 1.0 / (1.0 + math.exp(-z))
        val err = p - y
        g(0) += err
        k = 0
        while (k < x.length) {
          g(x(k)._1 + 1) += err * (x(k)._2.toDouble * inv); k += 1
        }
      }
      var k = 0
      while (k <= buckets) { w(k) -= learningRate * invN * g(k); k += 1 }
      iter += 1
    }
    w
  }

  /** Train the hashed-n-gram logistic regression on two seed classes.
    * Returns buckets+1 weights (bias first). Fully deterministic:
    * bounded sparse samples, positive-then-negative ascending-id fold,
    * zero init, fixed lr/iterations. */
  def trainHashed(pos: DataFrame, neg: DataFrame, idCol: String,
      textCol: String, buckets: Int = 4096, sampleCap: Int = 2000,
      iterations: Int = 200, learningRate: Double = 0.5): Array[Double] = {
    require(buckets >= 2 && sampleCap >= 1 && iterations >= 1 && learningRate > 0.0,
      "buckets must be >= 2, sampleCap/iterations >= 1 and learningRate > 0")
    val (posRows, negRows) =
      sampleSparseBoth(pos, neg, idCol, textCol, sampleCap, buckets)
    require(posRows.nonEmpty && negRows.nonEmpty,
      s"both seed classes must be non-empty (pos=${posRows.length}, neg=${negRows.length})")
    trainSparse(
      posRows.map(r => (r._3, r._2, 1.0)).toSeq ++
        negRows.map(r => (r._3, r._2, 0.0)).toSeq,
      buckets, iterations, learningRate)
  }

  /** `score_e6` Column over a STAGED gram-array column: z = w0 +
    * (Σ_g w[bucket(g)])/n folded left-to-right over the document's own
    * gram order, sigmoid, `(·1e6 + 0.5)::long`. The D bucket weights
    * ride the plan as an array literal. */
  private def hashedScoreE6(grams: Column, weights: Array[Double],
      buckets: Int): Column = {
    require(weights.length == buckets + 1,
      s"need ${buckets + 1} weights (bias first), got ${weights.length}")
    val wArr = typedLit(weights.drop(1).toSeq)
    val n = size(grams)
    val s = aggregate(grams, lit(0.0), (acc, g) =>
      acc + element_at(wArr,
        (pmod(xxhash64(g), lit(buckets.toLong)) + lit(1L)).cast("int")))
    val z = lit(weights(0)) +
      when(n > 0, s / n.cast("double")).otherwise(lit(0.0))
    (lit(1.0) / (lit(1.0) + exp(-z)) * lit(1e6) + lit(0.5)).cast("long")
  }

  /** Score every row map-side with a trained hashed-gram weight vector:
    * [[hashedScoreE6]] over the staged gram array, `keep` an integer
    * compare. No join, no shuffle, no UDF — the D weights are a plan
    * literal. Output: (idCol, n_grams, score_e6, keep). */
  def scoreHashed(df: DataFrame, idCol: String, textCol: String,
      weights: Array[Double], buckets: Int = 4096,
      tau: Double = 0.5): DataFrame = {
    val ts = CorpusFilters.words(coalesce(col(textCol), lit("")))
    val staged = df
      .select(col(idCol), ts.as("__ts"))
      .select(col(idCol), hashedGrams(col("__ts")).as("__grams"))
    staged
      .select(col(idCol), size(col("__grams")).cast("long").as("n_grams"),
        hashedScoreE6(col("__grams"), weights, buckets).as("score_e6"))
      .withColumn("keep", col("score_e6") >= lit((tau * 1e6).toLong))
  }

  /** Held-out evaluation of the hashed classifier — filter quality as a
    * FIRST-CLASS oracle-able output instead of a smoke print: train on
    * the two seed classes, score a DISJOINT labeled split, and emit one
    * row of confusion counts + e6 fixed-point metrics (precision /
    * recall / accuracy — integer floor division, engine-exact; an empty
    * denominator yields 0, loudly visible next to the raw counts).
    *
    * `eval` must carry `labelCol` (boolean, true = positive class) —
    * scoring keeps the label in the SAME projection, so the whole pass
    * stays shuffle-free up to the final 1-row aggregate (no score-to-
    * label join). At 100 TB the eval split is curated and bounded, but
    * nothing here depends on that: the pass is a map over `eval` however
    * large it is.
    *
    * Output row: (n_eval, tp, fp, fn, tn, precision_e6, recall_e6,
    * accuracy_e6) — BIGINT throughout. */
  def evaluateHashed(pos: DataFrame, neg: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, labelCol: String, tau: Double = 0.5,
      buckets: Int = 4096, sampleCap: Int = 2000, iterations: Int = 200,
      learningRate: Double = 0.5): DataFrame = {
    val w = trainHashed(pos, neg, idCol, textCol, buckets, sampleCap,
      iterations, learningRate)
    val ts = CorpusFilters.words(coalesce(col(textCol), lit("")))
    val staged = eval
      .select(col(labelCol).cast("boolean").as("__pos"), ts.as("__ts"))
      .select(col("__pos"), hashedGrams(col("__ts")).as("__grams"))
    val keep = hashedScoreE6(col("__grams"), w, buckets) >=
      lit((tau * 1e6).toLong)
    staged.select(col("__pos"), keep.as("__keep"))
      .agg(
        count(lit(1)).as("n_eval"),
        coalesce(sum(when(col("__pos") && col("__keep"), 1L).otherwise(0L)), lit(0L)).as("tp"),
        coalesce(sum(when(!col("__pos") && col("__keep"), 1L).otherwise(0L)), lit(0L)).as("fp"),
        coalesce(sum(when(col("__pos") && !col("__keep"), 1L).otherwise(0L)), lit(0L)).as("fn"),
        coalesce(sum(when(!col("__pos") && !col("__keep"), 1L).otherwise(0L)), lit(0L)).as("tn"))
      .select(col("n_eval"), col("tp"), col("fp"), col("fn"), col("tn"),
        expr("CASE WHEN tp + fp = 0 THEN 0L ELSE (tp * 1000000L) div (tp + fp) END")
          .as("precision_e6"),
        expr("CASE WHEN tp + fn = 0 THEN 0L ELSE (tp * 1000000L) div (tp + fn) END")
          .as("recall_e6"),
        expr("CASE WHEN n_eval = 0 THEN 0L ELSE ((tp + tn) * 1000000L) div n_eval END")
          .as("accuracy_e6"))
  }

  /** Train the hashed model on the seeds, score the whole corpus. */
  def trainAndScoreHashed(raw: DataFrame, pos: DataFrame, neg: DataFrame,
      idCol: String, textCol: String, tau: Double = 0.5,
      buckets: Int = 4096, sampleCap: Int = 2000, iterations: Int = 200,
      learningRate: Double = 0.5): DataFrame =
    scoreHashed(raw, idCol, textCol,
      trainHashed(pos, neg, idCol, textCol, buckets, sampleCap,
        iterations, learningRate),
      buckets, tau)
}
