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
}
