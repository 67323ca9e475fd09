package graft

/** Straight-line JVM mirror of q140 (seed-trained quality classifier)
  * for the SF-scale DuckDB oracle: re-derives every document's score
  * from the published contract of [[operators.QualityClassifier]] —
  * same feature semantics (code-point counts, Java-regex character
  * classes, Spark `trim`/`split` edge behavior), same bounded md5-hash
  * seed sampling, same ascending-id full-batch gradient descent, same
  * fixed-order scoring arithmetic — through independent imperative code,
  * never the DataFrame plan under test.
  */
object QualityMirror {

  /** Code-point count — Spark `length()` on strings. */
  private def cpLen(s: String): Int = s.codePointCount(0, s.length)

  /** Spark `trim()`: strips the SPACE character only (not Java's
    * whole-control-range `String.trim`). */
  private def sparkTrim(s: String): String = {
    var i = 0
    var j = s.length
    while (i < j && s.charAt(i) == ' ') i += 1
    while (j > i && s.charAt(j - 1) == ' ') j -= 1
    s.substring(i, j)
  }

  /** The [[operators.QualityClassifier.featureCols]] contract for one
    * text (null ⇒ empty). */
  private[graft] def featuresOf(text: String): Array[Double] = {
    val t = if (text == null) "" else text
    // split(trim(t), "\s+") with Spark's limit -1 (trailing empties kept)
    val toks = sparkTrim(t).split("\\s+", -1)
    val nToks = toks.length.toDouble
    val nDistinct = toks.distinct.length.toDouble
    val nChars = cpLen(t).toDouble
    val nPunct = cpLen(t.replaceAll("[^\\p{Punct}]", "")).toDouble
    val nDigit = cpLen(t.replaceAll("[^0-9]", "")).toDouble
    Array(
      StrictMath.log(1.0 + nToks),
      nDistinct / math.max(nToks, 1.0),
      nPunct / math.max(nChars, 1.0),
      nDigit / math.max(nChars, 1.0),
      nChars / math.max(nToks, 1.0) / 10.0)
  }

  private def sampleClass(rows: Seq[(Long, String)], sampleCap: Int)
      : Seq[Array[Double]] = {
    val n = rows.size
    val kept =
      if (n <= sampleCap) rows
      else rows.filter { case (id, _) => MirrorHash.inHashSample(id, sampleCap.toDouble / n) }
    kept.sortBy(_._1).map { case (_, t) => featuresOf(t) }
  }

  /** The [[operators.QualityClassifier.train]] contract: positive rows
    * (ascending id) then negative rows, zero init, full-batch GD. */
  private[graft] def train(pos: Seq[(Long, String)], neg: Seq[(Long, String)],
      sampleCap: Int = 2000, iterations: Int = 200,
      learningRate: Double = 0.5): Array[Double] = {
    val rows = sampleClass(pos, sampleCap).map(x => (x, 1.0)) ++
      sampleClass(neg, sampleCap).map(x => (x, 0.0))
    val d = 5
    val w = new Array[Double](d + 1)
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

  /** Fixed-order scoring arithmetic: left-nested z fold, sigmoid,
    * `(·1e6 + 0.5)::long`, integer threshold compare.
    *
    * `StrictMath.exp` (and `StrictMath.log` in [[featuresOf]]) is
    * deliberate and VERIFIED against the engine, not a 1-ulp gamble:
    * Spark 4's `exp`/`ln` produce StrictMath values on every path —
    * constant folding, interpreted eval AND whole-stage codegen (checked
    * empirically round 11 over range-derived inputs where
    * `Math.exp(x) != StrictMath.exp(x)`: 1891/1891 exp and 773/773 ln
    * matched StrictMath, 0 matched Math — Spark's math codegen is
    * platform-independent by design). Scala's `math.exp` (= `Math.exp`,
    * intrinsified) would be the 1-ulp flake here. */
  private[graft] def scoreOf(w: Array[Double], x: Array[Double]): Long = {
    var z = w(0)
    var k = 0
    while (k < x.length) { z += w(k + 1) * x(k); k += 1 }
    val sigmoid = 1.0 / (1.0 + StrictMath.exp(-z))
    (sigmoid * 1e6 + 0.5).toLong
  }

  /** q140 contract: pos seed = source "src0", neg seed = source "src1",
    * score the whole corpus at τ = 0.5.
    * Input: (doc_id, text, source); output (doc_id, score_e6, keep). */
  def recompute(docs: Seq[(Long, String, String)], tau: Double = 0.5)
      : Seq[(Long, Long, Boolean)] = {
    val w = train(
      docs.collect { case (id, t, "src0") => (id, t) },
      docs.collect { case (id, t, "src1") => (id, t) })
    val tauE6 = (tau * 1e6).toLong
    docs.sortBy(_._1).map { case (id, t, _) =>
      val s = scoreOf(w, featuresOf(t))
      (id, s, s >= tauE6)
    }
  }

  // ------------------------------------------------------------------
  // q144: hashed-n-gram (fastText-style) variant
  // ------------------------------------------------------------------

  /** Per-doc hashed-gram features for one text: (nGrams, sparse
    * ascending-(bucket, count) pairs) — the
    * [[operators.QualityClassifier.hashedGrams]] /
    * `pmod(xxhash64(gram), D)` contract, re-derived through the local
    * expression evaluators (null text ⇒ empty, the `coalesce` in the
    * operator). */
  private[graft] def hashedFeaturesOf(text: String, buckets: Int)
      : (Long, Array[(Int, Long)]) = {
    val grams = DsirMirror.gramsOf(if (text == null) "" else text)
    val m = scala.collection.mutable.HashMap.empty[Int, Long]
    grams.foreach { g =>
      val b = DsirMirror.bucketOf(g, buckets.toLong).toInt
      m.update(b, m.getOrElse(b, 0L) + 1L)
    }
    (grams.length.toLong, m.toArray.sortBy(_._1))
  }

  private def sampleClassHashed(rows: Seq[(Long, String)], sampleCap: Int,
      buckets: Int): Seq[(Long, Array[(Int, Long)])] = {
    val n = rows.size
    val kept =
      if (n <= sampleCap) rows
      else rows.filter { case (id, _) => MirrorHash.inHashSample(id, sampleCap.toDouble / n) }
    kept.sortBy(_._1).map { case (_, t) => hashedFeaturesOf(t, buckets) }
  }

  /** The [[operators.QualityClassifier.trainHashed]] contract: local
    * sampling membership + sparse features, then the SHARED
    * `trainSparse` driver loop (training runs driver-side in the
    * distributed path too — the BPE `learnMerges` precedent; the loop's
    * own determinism is pinned by QualityClassifierSpec's hand-planted
    * vectors). */
  private[graft] def trainHashed(pos: Seq[(Long, String)],
      neg: Seq[(Long, String)], buckets: Int = 4096, sampleCap: Int = 2000,
      iterations: Int = 200, learningRate: Double = 0.5): Array[Double] =
    operators.QualityClassifier.trainSparse(
      sampleClassHashed(pos, sampleCap, buckets).map { case (n, x) => (x, n, 1.0) } ++
        sampleClassHashed(neg, sampleCap, buckets).map { case (n, x) => (x, n, 0.0) },
      buckets, iterations, learningRate)

  /** Fixed-order scoring replay: z = w0 + (Σ_g w[bucket(g)])/n folded
    * left-to-right in the document's own gram order — the Column
    * `aggregate` fold — then sigmoid and `(·1e6 + 0.5)::long`. */
  private[graft] def scoreHashedOf(w: Array[Double], text: String,
      buckets: Int): (Long, Long) = {
    val grams = DsirMirror.gramsOf(if (text == null) "" else text)
    var s = 0.0
    grams.foreach(g => s += w(DsirMirror.bucketOf(g, buckets.toLong).toInt + 1))
    val z = w(0) + (if (grams.length > 0) s / grams.length.toDouble else 0.0)
    val sigmoid = 1.0 / (1.0 + StrictMath.exp(-z))
    (grams.length.toLong, (sigmoid * 1e6 + 0.5).toLong)
  }

  /** q144 contract: pos seed = source "src0", neg seed = source "src1",
    * hashed-bigram LR at D=4096, score the whole corpus at τ = 0.5.
    * Input: (doc_id, text, source); output (doc_id, n_grams, score_e6,
    * keep). */
  def recomputeHashed(docs: Seq[(Long, String, String)],
      buckets: Int = 4096, tau: Double = 0.5)
      : Seq[(Long, Long, Long, Boolean)] = {
    val w = trainHashed(
      docs.collect { case (id, t, "src0") => (id, t) },
      docs.collect { case (id, t, "src1") => (id, t) },
      buckets = buckets)
    val tauE6 = (tau * 1e6).toLong
    docs.sortBy(_._1).map { case (id, t, _) =>
      val (n, s) = scoreHashedOf(w, t, buckets)
      (id, n, s, s >= tauE6)
    }
  }

  /** q149 contract: held-out evaluation of the hashed classifier.
    * Labeled docs = source src0 (positive) / src1 (negative); seeds =
    * the 80% md5-bucket split (`deterministicSplit("seed"->0.8,
    * "eval"->0.2)` — bucket < hexThreshold(0.8); an id-modulo split
    * would correlate with the round-robin source assignment), held-out
    * = the other 20%; D=4096, τ=0.5.
    * Output ONE row (n_eval, tp, fp, fn, tn, precision_e6, recall_e6,
    * accuracy_e6) — integer floor division, empty denominators → 0. */
  def recomputeHashedEval(docs: Seq[(Long, String, String)],
      buckets: Int = 4096, tau: Double = 0.5)
      : (Long, Long, Long, Long, Long, Long, Long, Long) = {
    val labeled = docs.filter(d => d._3 == "src0" || d._3 == "src1")
    val isSeed = (id: Long) =>
      MirrorHash.md5Bucket4(id) < MirrorHash.hexThreshold(0.8)
    val seeds = labeled.filter(d => isSeed(d._1))
    val held = labeled.filterNot(d => isSeed(d._1))
    val w = trainHashed(
      seeds.collect { case (id, t, "src0") => (id, t) },
      seeds.collect { case (id, t, "src1") => (id, t) },
      buckets = buckets)
    val tauE6 = (tau * 1e6).toLong
    var tp = 0L; var fp = 0L; var fn = 0L; var tn = 0L
    held.foreach { case (_, t, src) =>
      val keep = scoreHashedOf(w, t, buckets)._2 >= tauE6
      val pos = src == "src0"
      if (pos && keep) tp += 1
      else if (!pos && keep) fp += 1
      else if (pos && !keep) fn += 1
      else tn += 1
    }
    val n = tp + fp + fn + tn
    def ratio(num: Long, den: Long) = if (den == 0L) 0L else num * 1000000L / den
    (n, tp, fp, fn, tn, ratio(tp, tp + fp), ratio(tp, tp + fn), ratio(tp + tn, n))
  }
}
