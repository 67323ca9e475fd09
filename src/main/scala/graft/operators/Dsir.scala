package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): select raw-corpus documents whose hashed-n-gram
  * distribution resembles a small high-quality TARGET corpus. The
  * standard pretraining-data recipe this engine's filter battery was
  * missing: Gopher rules / perplexity buckets score documents
  * intrinsically, DSIR scores them RELATIVE to a target distribution.
  *
  * Shape (all relational, nothing driver-side):
  *  1. features: unigrams + bigrams of the lower-cased token stream,
  *     hashed into `buckets` cells (`pmod(xxhash64(gram), B)`) — the
  *     paper's hashed n-gram generative model.
  *  2. two bucket-count aggregations (target, raw) — map-side
  *     combinable, B-bounded output; 1-row total aggregates ride a
  *     broadcast (the q134 vocab-size shape).
  *  3. per-bucket log-likelihood ratio λ_b =
  *     ln((c_t+1)/(T_t+B)) − ln((c_r+1)/(T_r+B)) (add-one smoothing),
  *     rounded to e4 fixed-point nats — the B-row λ table broadcasts.
  *  4. per-doc importance weight log w = Σ_b c_doc,b · λ_b as a pure
  *     BIGINT sum: order-proof across partitionings/retries, so the
  *     operator is bit-reproducible and externally oracle-able
  *     (the q134/q138 exactness contract).
  *  5. Gumbel-top-k resampling without replacement: a deterministic
  *     per-doc uniform from a salted xxhash64 of the id (same
  *     content-stable philosophy as [[Sampling]] — a rerun, a different
  *     partitioning or an appended shard never reshuffles the draw),
  *     g = −ln(−ln(u)) in e4 fixed point, select top-k by
  *     (log w + g) — equivalent to sampling k docs ∝ w without
  *     replacement (Gumbel-max trick). Planned as TakeOrderedAndProject:
  *     per-partition top-k, no global sort.
  *
  * At 100 TB: two gram-stream shuffles keyed by (bucket) / (id, bucket)
  * — both map-side combinable; λ and the totals are broadcast-sized;
  * selection is a distributed top-k. Nothing quadratic, nothing keyed by
  * an unbounded hot key.
  */
object Dsir {

  /** 2^63 as a double — maps `hash & Long.MaxValue` into [0, 1). */
  private val TwoPow63 = 9.223372036854775808e18

  /** Per-doc hashed-feature stream: (id, bucket), one row per unigram
    * and bigram occurrence. */
  private def features(df: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame = {
    val ts = CorpusFilters.words(col(textCol))
    df.select(col(idCol).cast("long").as("doc_id"),
        explode(concat(ts, CorpusFilters.wordNGrams(ts, 2))).as("gram"))
      .select(col("doc_id"), pmod(xxhash64(col("gram")), lit(buckets.toLong)).as("bucket"))
  }

  /** Per-document DSIR importance weights against a target corpus.
    *
    * Output: (idCol, n_feats, logw_e4) — one row per raw doc;
    * docs with no features (null/empty text) get (0, 0), the weight-1
    * convention (log 1 = 0). logw_e4 is Σ c_b·λ_b in e4 fixed-point
    * nats; BIGINT-exact while |Σ| < 2^63 (λ_e4 is bounded by
    * ±1e4·ln((T+B)·(c+1)) ≈ ±3e5, so a doc needs ~3e13 features to
    * overflow — not a real document).
    */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int = 8192): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val spark = raw.sparkSession
    import spark.implicits._
    val b = buckets.toLong

    val tCounts = features(target, idCol, textCol, buckets)
      .groupBy($"bucket").agg(count(lit(1)).as("c_t"))
    // per-doc bucket counts once; corpus counts derive from them, so the
    // raw gram stream (tokenize + hash, the dominant per-row cost) is
    // scanned once and the (doc_id, bucket) exchange is reused by both
    // consumers
    val perDocBucket = features(raw, idCol, textCol, buckets)
      .groupBy($"doc_id", $"bucket").agg(count(lit(1)).as("c"))
    val rCounts = perDocBucket.groupBy($"bucket").agg(sum($"c").as("c_r"))
    // 1-row total aggregates, broadcast onto the B-row count table — the
    // allowlisted bounded-probe BNLJ shape (see q134).
    val tTot = tCounts.agg(coalesce(sum($"c_t"), lit(0L)).as("t_tot"))
    val rTot = rCounts.agg(coalesce(sum($"c_r"), lit(0L)).as("r_tot"))

    // λ table: every bucket that occurs in the raw corpus (a doc bucket
    // always joins — raw docs contribute their own buckets to c_r).
    val lam = rCounts
      .join(tCounts, Seq("bucket"), "left")
      .crossJoin(broadcast(tTot))
      .crossJoin(broadcast(rTot))
      .select($"bucket",
        round((log((coalesce($"c_t", lit(0L)) + 1L).cast("double") /
                   ($"t_tot" + lit(b)).cast("double")) -
               log(($"c_r" + 1L).cast("double") /
                   ($"r_tot" + lit(b)).cast("double"))) * 1e4)
          .cast("long").as("lam_e4"))

    val perDoc = perDocBucket
      .join(broadcast(lam), "bucket")
      .groupBy($"doc_id")
      .agg(sum($"c").as("n_feats"), sum($"c" * $"lam_e4").as("logw_e4"))

    raw.select(col(idCol).cast("long").as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select($"doc_id".as(idCol),
        coalesce($"n_feats", lit(0L)).as("n_feats"),
        coalesce($"logw_e4", lit(0L)).as("logw_e4"))
  }

  /** Per-doc selection keys for Gumbel-max resampling: weights plus the
    * deterministic Gumbel perturbation, all map-side after
    * [[importanceWeights]]. Output: (idCol, n_feats, logw_e4, g_e4,
    * key_e4). For CORPUS-SCALE selection (k a large fraction of n),
    * filter these keys against a [[Quantiles.exactPositional]] cutoff
    * instead of calling [[resampleTopK]] — see the e2e v3 recipe — so
    * nothing funnels through a single top-k merge. */
  def importanceKeys(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int = 8192): DataFrame = {
    val h = xxhash64(concat(lit("dsir-gumbel-"), col(idCol).cast("string")))
    // u strictly inside (0, 1): (h & Long.MaxValue) + 0.5 halves cannot
    // reach 0, and the upper end is clamped one ulp below 1.0 — the
    // long→double cast ROUNDS, so hashes within 512 of 2^63 would
    // otherwise land exactly on u = 1.0 and blow -ln(-ln(u)) up to +∞
    // (a wrapped key that silently EXCLUDES a near-certain selection)
    val u = least(
      (h.bitwiseAND(lit(Long.MaxValue)).cast("double") + lit(0.5)) / lit(TwoPow63),
      lit(0.9999999999999999))
    importanceWeights(raw, target, idCol, textCol, buckets)
      .withColumn("g_e4", round(-log(-log(u)) * 1e4).cast("long"))
      .withColumn("key_e4", col("logw_e4") + col("g_e4"))
  }

  /** Gumbel-top-k importance resampling: k raw docs drawn without
    * replacement with probability ∝ exp(logw), via the Gumbel-max trick
    * on a deterministic per-id uniform.
    *
    * Output: (rnk, idCol, n_feats, logw_e4, key_e4), rnk 1..k by
    * (key_e4 desc, id asc). The k selected rows pass through one
    * TakeOrdered merge + one rank window, so this entry point is for
    * BOUNDED k (thousands); for corpus-fraction selection use
    * [[importanceKeys]] + a positional-quantile cutoff.
    */
  def resampleTopK(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, k: Int, buckets: Int = 8192): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val keyed = importanceKeys(raw, target, idCol, textCol, buckets)
      .orderBy(col("key_e4").desc, col(idCol).asc)
      .limit(k)
    // rank window over ≤ k rows (bounded by the limit above)
    val w = Window.orderBy(col("key_e4").desc, col(idCol).asc)
    keyed.withColumn("rnk", row_number().over(w))
      .select(col("rnk"), col(idCol), col("n_feats"), col("logw_e4"), col("key_e4"))
  }
}
