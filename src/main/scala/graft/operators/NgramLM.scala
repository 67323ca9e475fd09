package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained bigram language-model scoring — the CCNet-style
  * "perplexity filter" (Wenzek et al. 2020 train a KenLM and drop
  * high-perplexity documents). Here the LM is trained ON the corpus
  * being scored, fully inside the engine: add-one-smoothed bigram
  * probabilities P(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V), and each
  * document is scored by its total negative log-likelihood. Documents
  * whose word sequences are unlike the corpus (gibberish, boilerplate
  * key-value runs, wrong-language text) score high and can be trimmed
  * by quantile ([[Quantiles]]) or threshold.
  *
  * Scale shape (everything equi-keyed, nothing driver-side):
  *  - unigram/bigram count tables are one map-side-combinable shuffle
  *    each over vocab-sized keys;
  *  - V (vocab size) is a 1-row aggregate broadcast onto the unigram
  *    table (vocab-scale, not corpus-scale);
  *  - scoring joins each document's bigram occurrences to the two count
  *    tables on (w1, w2) / (w1) — per-occurrence 1:1 equi-joins, hot
  *    bigrams handled by AQE — then re-aggregates per doc_id.
  *
  * Engine-exactness: each occurrence's −ln P is rounded to e4
  * fixed-point nats BEFORE the per-document sum, so the total is a
  * BIGINT sum — bit-identical under any partitioning or merge order,
  * and DuckDB-oracle-checkable (SparkEntry q134). The inputs to ln are
  * exact small-integer ratios, identical in both engines; ln itself is
  * a non-correctly-rounded transcendental, so the two engines can
  * differ by an ulp — e4 granularity keeps a rounding-boundary flip at
  * ~1e-11 probability per distinct ratio (e6 would be ~100× riskier).
  */
object NgramLM {

  /** Per-document bigram-LM score.
    *
    * Output: (doc_id, n_bigrams, nll_e4) — total −ln P over the doc's
    * bigrams in e4 fixed-point nats; one row per input row (documents
    * with < 2 tokens score (0, 0)).
    */
  def bigramNll(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    val toks = df.select(col(idCol).cast("long").as("doc_id"),
      CorpusFilters.words(col(textCol)).as("ts"))

    val bigrams = toks
      .select($"doc_id", posexplode(CorpusFilters.wordNGrams($"ts", 2)))
      .select($"doc_id",
        split_part($"col", lit(" "), lit(1)).as("w1"),
        split_part($"col", lit(" "), lit(2)).as("w2"))

    val uniCounts = toks
      .select(explode($"ts").as("w1"))
      .groupBy($"w1").agg(count(lit(1)).as("c_uni"))
    // 1-row vocab-size aggregate broadcast onto the vocab-sized count
    // table (bounded-probe BNLJ, same shape as q73/q90's bounds row).
    val vocab = uniCounts.agg(count(lit(1)).as("v"))
    val uniWithV = uniCounts.crossJoin(broadcast(vocab))

    val bgCounts = bigrams.groupBy($"w1", $"w2").agg(count(lit(1)).as("c_bg"))

    val scored = bigrams
      .join(bgCounts, Seq("w1", "w2"))
      .join(uniWithV, Seq("w1"))
      .select($"doc_id",
        // exact integer ratio -> ln -> e4 fixed-point, rounded per term
        // so the downstream sum is pure BIGINT arithmetic
        round(-log(($"c_bg" + 1L).cast("double") / ($"c_uni" + $"v")) * 1e4)
          .cast("long").as("nll_term_e4"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum($"nll_term_e4").as("nll_e4"))

    toks.join(scored, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n_bigrams", lit(0L)).as("n_bigrams"),
        coalesce($"nll_e4", lit(0L)).as("nll_e4"))
  }

  /** Held-out bigram-LM scoring: train counts on one frame, score a
    * DIFFERENT frame — the actual CCNet deployment shape (train a LM on
    * a trusted corpus, perplexity-filter each incoming batch against
    * it). Unlike [[bigramNll]] (corpus-self-training, where every scored
    * bigram exists in the counts by construction), a held-out batch
    * contains bigrams and words the training corpus never saw, so the
    * probe joins are LEFT and add-one smoothing supplies the backoff:
    *
    *   seen bigram:            P = (c_bg + 1) / (c_uni + V)
    *   unseen bigram, seen w1: P = 1 / (c_uni + V)
    *   unseen w1:              P = 1 / V
    *
    * — one formula, P = (coalesce(c_bg,0)+1) / (coalesce(c_uni,0)+V),
    * since an unseen w1 cannot have a training bigram. V is the TRAIN
    * vocab size; out-of-vocab score-side words do not grow it.
    *
    * Scale shape matches [[bigramNll]]: two map-side-combinable count
    * shuffles over the train frame, per-occurrence LEFT equi-joins on
    * the score frame's bigrams (AQE handles hot head words), and the
    * 1-row V aggregate broadcast onto the scored bigrams (linear
    * stream × 1-row BNLJ, the q90 bounds-row shape — here it must ride
    * the score side, not the unigram table, because rows that miss the
    * w1 join still need V for the 1/V backoff).
    *
    * Output: (doc_id, n_bigrams, oov_bigrams, nll_e4) — one row per
    * score-frame row; oov_bigrams counts terms that took either backoff
    * (c_bg = 0), the standard coverage diagnostic next to perplexity.
    * Same e4 fixed-point BIGINT-sum exactness contract as [[bigramNll]].
    */
  def bigramNllHeldOut(train: DataFrame, score: DataFrame,
                       idCol: String, textCol: String): DataFrame = {
    val spark = train.sparkSession
    import spark.implicits._

    def toToks(df: DataFrame): DataFrame =
      df.select(col(idCol).cast("long").as("doc_id"),
        CorpusFilters.words(col(textCol)).as("ts"))
    def toBigrams(toks: DataFrame): DataFrame = toks
      .select($"doc_id", posexplode(CorpusFilters.wordNGrams($"ts", 2)))
      .select($"doc_id",
        split_part($"col", lit(" "), lit(1)).as("w1"),
        split_part($"col", lit(" "), lit(2)).as("w2"))

    val trainToks = toToks(train)
    val uniCounts = trainToks
      .select(explode($"ts").as("w1"))
      .groupBy($"w1").agg(count(lit(1)).as("c_uni"))
    val vocab = uniCounts.agg(count(lit(1)).as("v"))
    val bgCounts = toBigrams(trainToks)
      .groupBy($"w1", $"w2").agg(count(lit(1)).as("c_bg"))

    val scoreToks = toToks(score)
    val scored = toBigrams(scoreToks)
      .join(bgCounts, Seq("w1", "w2"), "left")
      .join(uniCounts, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select($"doc_id",
        when($"c_bg".isNull, 1L).otherwise(0L).as("oov_term"),
        round(-log((coalesce($"c_bg", lit(0L)) + 1L).cast("double") /
            (coalesce($"c_uni", lit(0L)) + $"v")) * 1e4)
          .cast("long").as("nll_term_e4"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum($"oov_term").as("oov_bigrams"),
        sum($"nll_term_e4").as("nll_e4"))

    scoreToks.join(scored, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n_bigrams", lit(0L)).as("n_bigrams"),
        coalesce($"oov_bigrams", lit(0L)).as("oov_bigrams"),
        coalesce($"nll_e4", lit(0L)).as("nll_e4"))
  }
}
