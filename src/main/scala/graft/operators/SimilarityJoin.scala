package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dict.TitleDictionary
import graft.functions.TitleStandardizer
import graft.text.Tokenize

/** DataFrame-native TF-IDF cosine similarity join against the bundled BLS
  * dictionary — the shuffle-based scale path for `standardize_title`
  * (SURVEY.md §2.4). Where the per-row UDF brute-forces the dictionary per
  * input, this plan generalizes to an arbitrarily large query side:
  *
  *   query rows
  *     → qvec UDF (per-row sparse TF-IDF vector, per-JVM index — no
  *       broadcast of unbounded state, no driver collect)
  *     → explode terms
  *     → equi-join on term against the dictionary postings DataFrame
  *       (~60k rows — broadcast, so the big side never shuffles here)
  *     → groupBy(query, doc) partial dot-products (map-side combine)
  *     → row_number window top-k per query (desc score, asc doc id — the
  *       reference's strict-`>`/lowest-index argmax, `/root/reference/src/utils.rs:173-181`)
  *
  * The only shuffles are keyed by query id — at 100 TB this is one
  * aggregation + one window over well-distributed keys; nothing is
  * proportional to (queries × dictionary).
  */
object SimilarityJoin {

  /** Spark string sort order (UTF-8 binary) for the prefix-filter term
    * tie-break — matches the former `$"term".asc` window semantics and
    * the SfOracles mirror's `utf8Ord`. */
  private val utf8TermOrdering: Ordering[(String, Long)] = (a, b) =>
    org.apache.spark.unsafe.types.UTF8String.fromString(a._1)
      .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b._1))

  /** Per-row sparse query vector over the dictionary vocabulary:
    * array of (term id, weight) + precomputed norm. */
  private val qvecUdf = udf { (s: String) =>
    if (s == null) Array.empty[(Int, Double)]
    else {
      val (ti, tv) = TitleStandardizer.index.queryVector(Tokenize.tokenizeAndStem(s))
      ti.zip(tv)
    }
  }

  /** Dictionary postings as a DataFrame: one row per (term, doc) weight.
    * Small (≈60k rows) and static — built once from the per-JVM index. */
  def dictPostings(spark: SparkSession): DataFrame = {
    val idx = TitleStandardizer.index
    val rows = for {
      d <- (0 until idx.numDocs).iterator
      k <- idx.docIdx(d).indices.iterator
    } yield (idx.docIdx(d)(k), d, idx.docVal(d)(k), idx.docNorms(d))
    spark.createDataFrame(rows.toSeq).toDF("term", "doc_id", "dw", "doc_norm")
  }

  /** Dictionary dimension: doc id → alias string → BLS category. */
  def dictDocs(spark: SparkSession): DataFrame = {
    val corpus = TitleDictionary.corpus
    val rows = corpus.indices.map { d =>
      val alias = corpus(d)
      (d, alias, TitleDictionary.categoryOf(alias))
    }
    spark.createDataFrame(rows).toDF("doc_id", "alias", "category")
  }

  /** Top-k dictionary matches per input row.
    *
    * @param queries   input DataFrame
    * @param idCol     unique row id column
    * @param textCol   raw text column to match
    * @param k         matches per row
    * @param keepUnmatched if true, rows whose query vector is empty
    *   (all-OOV/empty input) fall back to dictionary doc 0 with score 0.0 —
    *   the reference's `-0.0` strict-`>` fallback semantics.
    * @return (idCol, rnk, match_doc_id, alias, category, score)
    */
  def topK(
      queries: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 1,
      keepUnmatched: Boolean = true): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._

    val q = queries
      .select(col(idCol).as("qid"), qvecUdf(col(textCol)).as("qv"))
      .withColumn("qnorm", sqrt(aggregate($"qv", lit(0.0), (a, x) => a + x("_2") * x("_2"))))

    val exploded = q
      .filter(size($"qv") > 0)
      .select($"qid", $"qnorm", explode($"qv").as("tw"))
      .select($"qid", $"qnorm", $"tw._1".as("term"), $"tw._2".as("qw"))

    val scored = exploded
      .join(broadcast(dictPostings(spark)), "term")
      .groupBy($"qid", $"doc_id")
      .agg(first($"qnorm").as("qnorm"), first($"doc_norm").as("doc_norm"),
        sum($"qw" * $"dw").as("dot"))
      .withColumn("score",
        when($"doc_norm" > 0.0 && $"qnorm" > 0.0, $"dot" / ($"doc_norm" * $"qnorm"))
          .otherwise(lit(0.0)))

    val w = Window.partitionBy($"qid").orderBy($"score".desc, $"doc_id".asc)
    val top = scored
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= k)
      .select($"qid", $"rnk", $"doc_id", $"score")

    val withFallback =
      if (!keepUnmatched) top
      else {
        // all-OOV rows: reference argmax keeps doc 0 under strict `>` vs
        // -0.0. One left join + coalesce (cheaper than anti-join + union).
        q.select($"qid").join(top, Seq("qid"), "left")
          .select($"qid",
            coalesce($"rnk", lit(1)).as("rnk"),
            coalesce($"doc_id", lit(0)).as("doc_id"),
            coalesce($"score", lit(0.0)).as("score"))
      }

    withFallback
      .join(broadcast(dictDocs(spark)), "doc_id")
      // rename the dictionary id so it can never collide with idCol
      .select(col("qid").as(idCol), $"rnk", $"doc_id".as("match_doc_id"),
        $"alias", $"category", $"score")
  }

  /** Fully distributed TF-IDF similarity join against an ARBITRARY right
    * DataFrame — no driver-side index at all. Both sides scale: the
    * vocabulary (term → df → idf) is computed with one aggregation over
    * the right side, weights/norms with map-side math, and matching with
    * the same inverted-index equi-join + windowed argmax as [[topK]].
    *
    * Numeric semantics match the reference formula exactly (tf = count /
    * total-token-count with OOV counted in the denominator, idf =
    * ln(N/df) unsmoothed), so joining against the dictionary corpus as a
    * plain DataFrame reproduces [[topK]] — asserted in SimilarityJoinSpec.
    *
    * DETERMINISM CONTRACT (round 9): every cross-partition float
    * aggregation (per-doc norm², per-pair dot) rounds its addends to e9
    * fixed-point BIGINT BEFORE summing — integer addition is
    * order-proof, so the scores (and therefore the argmax) are
    * bit-identical across partitionings, retries and speculative
    * re-execution. Rounding is `(x·1e9 + 0.5)::long` (= HALF_UP for the
    * nonnegative weights here) — plain codegen arithmetic, not the
    * BigDecimal-backed `round()`. A plain `sum(double)` here merges partial sums in
    * nondeterministic order: two runs of the same 100 TB job could pick
    * different winners on near-ties, and no external oracle could ever
    * pin the output. Exact while per-group Σ|addend|·1e9 < 2⁶³ (norm²
    * < 9.2e9 — any real document); scores deviate from the
    * infinite-precision cosine by ≲1e-8. The per-doc-norm aggregation
    * stays a map-side-combinable 8-byte HashAggregate (a sorted
    * collect_list fold would shuffle whole term lists per doc).
    *
    * @return (leftId, rnk, rightId, score)
    */
  /** The derived RIGHT side of the distributed similarity joins — the
    * tokenize → df/idf → weight pipeline over the (usually static)
    * dictionary frame, materialized once and reusable across retrieval
    * batches. The dictionary twin of the persisted-index serving story
    * (q154/q155): per-call cost should scale with the BATCH, and
    * re-deriving a static 30k-alias dictionary per call was the dominant
    * per-call constant of q46/q49 (~1 s of the ~2.5 s bench entry).
    * Obtain via [[prepareRight]]; pass to [[topKAgainst]] /
    * [[thresholdJoin]] overloads. Holds cached frames — contents are
    * frozen at preparation; re-prepare if the right side's data changes.
    */
  final case class PreparedRight private[operators] (
      numDocs: Long,
      idf: DataFrame,      // (term, df, idf), cached
      rWeights: DataFrame) // (term, df, rid, dw), cached

  /** Tokenize/weight an arbitrary right side ONCE (see [[PreparedRight]]).
    * Identical derivation to the inline path — scores are bit-equal
    * (`SimilarityJoinSpec` pins the prepared overloads row-for-row). */
  def prepareRight(right: DataFrame, rightId: String,
      rightText: String): PreparedRight = {
    val spark = right.sparkSession
    import spark.implicits._
    val tokensUdf = udf((s: String) =>
      if (s == null) Array.empty[String] else Tokenize.tokenizeAndStem(s))
    // tokenized right side cached FIRST; the numDocs scalar (idf
    // denominator — counts every right row, empty-token docs included)
    // comes from materializing that cache, not a separate raw-table scan
    val rTok = right
      .select(col(rightId).as("rid"), tokensUdf(col(rightText)).as("toks"))
      .withColumn("len", size($"toks"))
      .cache()
    val numDocs = rTok.count()
    val rTerms = rTok
      .select($"rid", $"len", explode($"toks").as("term"))
      .groupBy($"rid", $"len", $"term").agg(count(lit(1)).as("cnt"))
    val idf = rTerms.groupBy($"term")
      .agg(count(lit(1)).as("df"))
      .withColumn("idf", log(lit(numDocs.toDouble) / $"df"))
      .cache()
    val rWeights = rTerms.join(idf, "term")
      .withColumn("dw", ($"cnt".cast("double") / $"len") * $"idf")
      .select($"term", $"df", $"rid", $"dw")
      .cache()
    rWeights.count() // materialize both caches; the tokenize pass ran once
    rTok.unpersist()
    PreparedRight(numDocs, idf, rWeights)
  }

  def topKAgainst(
      left: DataFrame, leftId: String, leftText: String,
      right: DataFrame, rightId: String, rightText: String,
      k: Int = 1, maxDf: Double = 1000.0): DataFrame =
    topKAgainst(left, leftId, leftText,
      prepareRight(right, rightId, rightText), rightId, k, maxDf)

  /** [[topKAgainst]] over a [[PreparedRight]] — identical plan tail,
    * zero right-side derivation cost per call. */
  def topKAgainst(
      left: DataFrame, leftId: String, leftText: String,
      prepared: PreparedRight, rightId: String,
      k: Int, maxDf: Double): DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._
    val tokensUdf = udf((s: String) =>
      if (s == null) Array.empty[String] else Tokenize.tokenizeAndStem(s))
    val numDocs = prepared.numDocs
    val idf = prepared.idf
    val rWeights = prepared.rWeights
    val rNorms = rWeights.groupBy($"rid")
      .agg(sum(($"dw" * $"dw" * lit(1e9) + lit(0.5)).cast("long")).as("dn2_e9"))
      .select($"rid", sqrt($"dn2_e9".cast("double") / lit(1e9)).as("doc_norm"))
    // With an INFINITE cap this join is EXACT — and quadratic in the
    // worst case (all-co-occurrence; 764 s at 100k×100k, SCALE.md):
    // spec-only baseline territory, so exactness is opt-in
    // (maxDf = Double.PositiveInfinity) and the DEFAULT is a finite
    // absolute cap (1000) that bounds per-term fanout so candidate work
    // is linear in n. Under a finite cap, scores count only
    // sub-cap shared terms against the FULL norms (a lower bound that
    // biases the argmax toward informative terms — the behavior a
    // stopword-insensitive matcher wants, declared approximate).
    val dfCap = if (maxDf <= 1.0) math.max(1.0, maxDf * numDocs) else maxDf
    val postings = rWeights.filter($"df" <= dfCap).join(rNorms, "rid")
      .select($"term", $"rid", $"dw", $"doc_norm")

    // left query vectors reuse the right side's idf; OOV terms drop out of
    // the join but stay in the tf denominator (token-count `len`)
    val lTerms = left
      .select(col(leftId).as("qid"), tokensUdf(col(leftText)).as("toks"))
      .withColumn("len", size($"toks"))
      .select($"qid", $"len", explode($"toks").as("term"))
      .groupBy($"qid", $"len", $"term").agg(count(lit(1)).as("cnt"))
    val lWeights = lTerms.join(idf, "term")
      .withColumn("qw", ($"cnt".cast("double") / $"len") * $"idf")
      .cache() // consumed by the norm aggregation AND the candidate join
    val lNorms = lWeights.groupBy($"qid")
      .agg(sum(($"qw" * $"qw" * lit(1e9) + lit(0.5)).cast("long")).as("qn2_e9"))
      .select($"qid", sqrt($"qn2_e9".cast("double") / lit(1e9)).as("qnorm"))

    // qnorm attaches at the CANDIDATE level, not the term level: joining
    // lNorms onto every (qid, term) row before the postings join shuffles
    // the whole term frame by qid just to carry one double along, and the
    // subsequent (qid, rid) aggregate + qid window then need two more
    // exchanges (hashpartitioning(qid, rid) does not satisfy the window's
    // qid clustering). Deferring the join means the dot aggregation runs
    // straight off the postings join, the candidates-by-qid join is the
    // only qid exchange, and the top-k window rides that partitioning
    // with no further shuffle. Score algebra is unchanged (e9 BIGINT dot,
    // same norms, same zero-norm guard).
    val scored = lWeights.select($"term", $"qid", $"qw").join(postings, "term")
      .groupBy($"qid", $"rid")
      .agg(first($"doc_norm").as("doc_norm"),
        sum(($"qw" * $"dw" * lit(1e9) + lit(0.5)).cast("long")).as("dot_e9"))
      .join(lNorms, "qid")
      .withColumn("score",
        when($"doc_norm" > 0.0 && $"qnorm" > 0.0,
          ($"dot_e9".cast("double") / lit(1e9)) / ($"doc_norm" * $"qnorm"))
          .otherwise(lit(0.0)))

    val w = Window.partitionBy($"qid").orderBy($"score".desc, $"rid".asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= k)
      .select($"qid".as(leftId), $"rnk", $"rid".as(rightId), $"score")
  }

  /** Threshold similarity join with LOSSLESS prefix-filter candidate
    * pruning — the fix for [[topKAgainst]]'s quadratic candidate growth
    * (measured: 100k×100k all-co-occurrence pairs took 764 s in the 1M-row
    * scale smoke; candidates grow ~n²/vocabulary).
    *
    * Prefix-filter bound (AllPairs/PPJoin family): with normalized query
    * weights q̂ and doc weights d̂ ≤ 1, cos(q,d) ≤ Σ_{t shared} q̂_t. Sort
    * a query's terms by weight descending and let the suffix be the
    * largest tail with Σ q̂_t < τ — a doc sharing ONLY suffix terms can
    * never reach τ, so only prefix terms generate candidates. Exact
    * scoring then runs on candidate pairs from full vector maps.
    * τ = 0 degenerates to the exact all-candidates join.
    *
    * `maxDf` additionally excludes ultra-common terms from CANDIDATE
    * GENERATION (≤ 1 ⇒ fraction of the corpus; > 1 ⇒ absolute document
    * count). Without it, corpora with stopword-dominated documents stay
    * quadratic: a stopword in one document's prefix drags a large share of
    * the corpus in as candidates (measured on a 100k×100k Zipf corpus:
    * uncapped didn't finish in 12 min; absolute cap ~150 ⇒ 72 s vs 764 s
    * for the exact all-candidates join — and only an ABSOLUTE cap keeps
    * the join linear in n, a fractional cap re-grows with the corpus).
    * The approximation is narrow and standard: pairs sharing ONLY
    * ultra-common terms may be missed; such terms still count in the
    * exact score of every pair that survives. Set to 1.0 for strictly
    * lossless pruning.
    *
    * Shares [[topKAgainst]]'s determinism contract: norm² sums and the
    * prefix-filter mass sums are e9 fixed-point BIGINTs (order-proof
    * across partitionings/retries), and the exact per-pair scoring UDF
    * folds the smaller vector's terms in sorted order — the whole
    * operator is bit-reproducible and externally oracle-able.
    *
    * @return (leftId, rnk, rightId, score) with score ≥ minScore
    */
  def thresholdJoin(
      left: DataFrame, leftId: String, leftText: String,
      right: DataFrame, rightId: String, rightText: String,
      k: Int, minScore: Double, maxDf: Double = 0.05): DataFrame =
    thresholdJoin(left, leftId, leftText,
      prepareRight(right, rightId, rightText), rightId, k, minScore, maxDf)

  /** [[thresholdJoin]] over a [[PreparedRight]] — identical plan tail,
    * zero right-side derivation cost per call. */
  def thresholdJoin(
      left: DataFrame, leftId: String, leftText: String,
      prepared: PreparedRight, rightId: String,
      k: Int, minScore: Double, maxDf: Double): DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._
    val tokensUdf = udf((s: String) =>
      if (s == null) Array.empty[String] else Tokenize.tokenizeAndStem(s))
    val numDocs = prepared.numDocs
    val idf = prepared.idf
    val rWeights = prepared.rWeights
    // candidate-generation postings exclude ultra-common terms (they still
    // participate in exact scoring through the rWeights join below)
    val dfCap = if (maxDf <= 1.0) math.max(1.0, maxDf * numDocs) else maxDf
    val postings = rWeights.filter($"df" <= dfCap).select($"term", $"rid")

    // The ENTIRE left side lives in one cached qid-keyed frame: a single
    // aggregation builds each query's sparse vector map and its e9
    // fixed-point norm² (order-proof BIGINT sum — see topKAgainst
    // determinism contract) in the same groupBy. Prefix selection,
    // candidate dedup, exact scoring and the top-k window are all keyed
    // by qid, so after this one shuffle the big side never exchanges
    // again except through the term-keyed candidate join (where it
    // carries only (qid, term)). The previous shape ran FOUR separate
    // qid-keyed frames (weights, norms, prefix window, vector agg) plus
    // a (qid,rid) dropDuplicates — measured 4.6 s → 2.x s at sf0.1 from
    // collapsing them; at 100 TB it removes three big-side shuffles.
    val lAgg = left
      .select(col(leftId).as("qid"), tokensUdf(col(leftText)).as("toks"))
      .withColumn("len", size($"toks"))
      .select($"qid", $"len", explode($"toks").as("term"))
      .groupBy($"qid", $"len", $"term").agg(count(lit(1)).as("cnt"))
      .join(idf, "term")
      .withColumn("qw", ($"cnt".cast("double") / $"len") * $"idf")
      .groupBy($"qid")
      .agg(map_from_arrays(collect_list($"term"), collect_list($"qw")).as("qvec"),
        sum(($"qw" * $"qw" * lit(1e9) + lit(0.5)).cast("long")).as("qn2_e9"))
      .select($"qid", $"qvec", sqrt($"qn2_e9".cast("double") / lit(1e9)).as("qnorm"))
      .cache() // consumed by prefix selection AND scoring

    // Prefix-filter term selection (AllPairs/PPJoin family) as a map-side
    // pass over the query vector: in (weight desc, term asc-UTF8) order a
    // term i stays in the prefix iff the NORMALIZED tail starting at i,
    // (Σ_{j≥i} qw)/‖q‖, could still reach τ — a doc sharing only later
    // terms can never hit minScore. The tail is monotone decreasing, so
    // the per-term filter is a take-while; computing it inside a UDF over
    // the already-aggregated qvec replaces the former qid-window pass
    // (join + shuffle + sort) with zero extra exchanges. The tail is a
    // BIGINT sum of qw_e9 = (qw·1e9 + 0.5)::long (deterministic in any
    // partitioning/merge order, identical algebra to the SfOracles
    // mirror); the bound carries a 1e-6 slack so e9 rounding can only ADD
    // prefix terms, never drop a term whose true tail mass still reaches
    // τ — the pruning stays lossless. At τ ≤ 0 every term is kept by
    // construction, so the UDF is skipped (df-cap-only pruning).
    val prefixTerms =
      if (minScore <= 0.0) lAgg.select($"qid", explode(map_keys($"qvec")).as("term"))
      else {
        val bound = minScore - 1e-6
        val prefixUdf = udf { (vec: Map[String, Double], qnorm: Double) =>
          val ordered = vec.toArray
            .map { case (t, qw) => (t, (qw * 1e9 + 0.5).toLong) }
            .sorted(Ordering.by[(String, Long), Long](-_._2).orElse(utf8TermOrdering))
          var tail = 0L
          ordered.foreach(tail += _._2)
          val out = Array.newBuilder[String]
          var i = 0
          var go = true
          while (go && i < ordered.length) {
            if (tail.toDouble / 1e9 / qnorm >= bound) {
              out += ordered(i)._1; tail -= ordered(i)._2; i += 1
            } else go = false
          }
          out.result()
        }
        lAgg.filter($"qnorm" > 0.0)
          .select($"qid", explode(prefixUdf($"qvec", $"qnorm")).as("term"))
      }

    // Candidate dedup as a qid-keyed collect_set (map-side combining)
    // instead of a (qid,rid) dropDuplicates: the aggregate lands on the
    // same hash partitioning as the cached lAgg, so the scoring join
    // below is exchange-free on the big side.
    //
    // PER-QID MEMORY BOUND: collect_set concentrates one query's whole
    // candidate set in a single row, which is only safe because the
    // df-cap upstream bounds it — each of the ≤|prefix| query terms
    // matches ≤ maxDf postings, so |rids| ≤ |prefix|·maxDf (the shipped
    // q49 runs ~10 terms × 1000 df-cap = ≤10⁴ ids ≈ 80 KB/row). Callers
    // raising maxDf toward ∞ should switch this back to the spilling
    // (qid,rid) dropDuplicates shape — an unbounded hot query would
    // otherwise build one executor-resident array per row.
    val candidates = prefixTerms
      .join(postings, "term") // df-capped: common prefix terms match nothing
      .groupBy($"qid").agg(collect_set($"rid").as("rids"))

    // Exact scoring via per-side sparse vector maps joined onto the DEDUPED
    // candidate pairs. Scoring from the postings (candidates ⋈ weights ⋈
    // rWeights + partial-agg dot) looks Spark-ier but multiplies every
    // candidate row by its query-term count and shuffles that expansion
    // twice — measured 1022 s vs 72 s for this shape at 100k×100k
    // (SCALE.md). One map per side per pair keeps the scoring cost
    // proportional to |candidates|.
    val rVecs = rWeights.groupBy($"rid")
      .agg(map_from_arrays(collect_list($"term"), collect_list($"dw")).as("dvec"),
        sum(($"dw" * $"dw" * lit(1e9) + lit(0.5)).cast("long")).as("dn2_e9"))
      .select($"rid", $"dvec", sqrt($"dn2_e9".cast("double") / lit(1e9)).as("doc_norm"))
    val sparseDot = udf { (a: Map[String, Double], b: Map[String, Double]) =>
      val (small, big) = if (a.size <= b.size) (a, b) else (b, a)
      // deterministic order: accumulate in sorted-key order
      small.toArray.sortBy(_._1).foldLeft(0.0) { case (acc, (t, w)) =>
        acc + big.getOrElse(t, 0.0) * w
      }
    }
    val scored = candidates
      .join(lAgg, "qid") // zip join: both sides already qid-partitioned
      .select($"qid", $"qvec", $"qnorm", explode($"rids").as("rid"))
      .join(rVecs, "rid")
      .withColumn("score",
        when($"doc_norm" > 0.0 && $"qnorm" > 0.0,
          sparseDot($"qvec", $"dvec") / ($"doc_norm" * $"qnorm")).otherwise(lit(0.0)))

    val w = Window.partitionBy($"qid").orderBy($"score".desc, $"rid".asc)
    scored
      .filter($"score" >= minScore)
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= k)
      .select($"qid".as(leftId), $"rnk", $"rid".as(rightId), $"score")
  }

  /** Convenience: the reference's `"<alias> - <category>"` composite via the
    * scalable path (top-1). */
  def standardizeViaJoin(queries: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    topK(queries, idCol, textCol, k = 1)
      .select(col(idCol), concat($"alias", lit(" - "), $"category").as("std"))
  }
}
