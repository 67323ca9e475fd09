package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact substring-level deduplication: remove every token span that is
  * part of a k-token gram occurring ≥ `minRepeat` times anywhere in the
  * corpus — the ExactSubstr dedup of Lee et al. 2022 ("Deduplicating
  * Training Data Makes Language Models Better"), re-expressed as
  * relational algebra instead of a suffix array.
  *
  * Where doc-level dedup (exact / MinHash, [[Dedup]]) drops whole
  * documents and chunk dedup ([[CorpusFilters.chunkDedup]]) drops fixed
  * blocks, this removes the *overlapping-span closure* of repeated
  * k-grams inside otherwise-unique documents — boilerplate headers,
  * license blocks, templated paragraphs.
  *
  * Algorithm (all equi-keyed, no suffix array, no driver state):
  *  1. k-gram postings (doc_id, pos, gram) — map-side from the tokenizer.
  *  2. duplicated grams = groupBy(gram) HAVING count ≥ minRepeat — one
  *     shuffle; the count combines map-side, so a gram repeated millions
  *     of times (the exact case this operator exists for) collapses to
  *     ≤ 1 row per map partition before the exchange.
  *  3. hit positions = postings ⋈ duplicated grams (equi-join on gram;
  *     the dup-gram side is distinct, so output is 1:1 with postings and
  *     AQE handles any hot gram).
  *  4. spans: per-doc gaps-and-islands over hit starts (window keyed by
  *     doc_id — bounded by document length, never corpus-wide): a hit at
  *     `pos` opens a new island iff it starts past the running
  *     max-end + 1; islands merge overlapping AND adjacent spans.
  *  5. removal is MAP-SIDE: the per-doc span list is collected (spans per
  *     doc ≤ n_tokens/2 by construction) and joined back on doc_id; the
  *     cleaned text is a higher-order `filter` over the token array —
  *     tokens never leave their row, so there is no corpus-wide
  *     (doc_id, pos) explode/reassemble shuffle.
  *
  * Token space is [[CorpusFilters.words]] (lowercased, whitespace-split,
  * empties dropped), so the cleaned text is token-normalized; `cleaned`
  * is surfaced as an md5 so the result is DuckDB-oracle-checkable
  * bit-for-bit (SparkEntry q133).
  *
  * Reference scope note: the reference engine (reference/src/lib.rs:43-87)
  * ships no dedup operator; this is part of the mandated LLM-pipeline
  * surface built on top of the same corpus tables.
  */
object SubstringDedup {

  /** Per-document span stats + cleaned text hash.
    *
    * Output: (doc_id, n_tokens, n_spans, dup_tokens, cleaned_md5),
    * one row per input row (ordering is the caller's concern — baking a
    * corpus-wide sort into the operator would cost every composed
    * pipeline a range exchange it rarely needs).
    */
  def dedupSpans(df: DataFrame, idCol: String, textCol: String,
                 k: Int = 8, minRepeat: Int = 2,
                 singlePassMaxDocs: Long = 1000000L,
                 numDocsHint: Long = -1L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    dedupText(df, idCol, textCol, k, minRepeat, singlePassMaxDocs, numDocsHint)
      .select($"doc_id", $"n_tokens", $"n_spans", $"dup_tokens",
        md5($"cleaned".cast("binary")).as("cleaned_md5"))
  }

  /** [[dedupSpans]] but surfacing the cleaned token-normalized text
    * itself instead of its md5 — the form composed pipelines consume
    * (chunk-dedup / LM-score / pack the deduped text downstream).
    *
    * Output: (doc_id, n_tokens, n_spans, dup_tokens, cleaned), one row
    * per input row; same span semantics and scale shape as
    * [[dedupSpans]] (which is now a thin md5 projection over this).
    */
  def dedupText(df: DataFrame, idCol: String, textCol: String,
                k: Int = 8, minRepeat: Int = 2,
                singlePassMaxDocs: Long = 1000000L,
                numDocsHint: Long = -1L): DataFrame = {
    require(k >= 2, s"gram width must be >= 2, got $k")
    require(minRepeat >= 2, s"minRepeat must be >= 2, got $minRepeat")
    val spark = df.sparkSession
    import spark.implicits._

    val toks = df.select(col(idCol).cast("long").as("doc_id"),
      CorpusFilters.words(col(textCol)).as("ts"))

    // (doc_id, pos, gram) postings; wordNGrams is position-ordered so
    // posexplode's 0-based index + 1 IS the 1-based token start.
    val grams = toks
      .select($"doc_id", posexplode(CorpusFilters.wordNGrams($"ts", k)))
      .select($"doc_id", ($"pos" + 1).cast("long").as("pos"), $"col".as("gram"),
        xxhash64($"col").as("gh"))

    // TWO-PASS dup detection (round 10), ADAPTIVE (round 11): counting
    // the GRAM STRINGS directly shuffles ~80 bytes per distinct gram per
    // partition — on a mostly-unique corpus that is nearly the whole
    // posting stream (the 100M-doc smoke filled 230 GB of local shuffle
    // temp and died). Pass 1 counts 8-byte xxhash64 keys (map-side
    // combinable, ~5-10× fewer exchange bytes) into a candidate set:
    // collisions can only ADD counts, so candidates are a SUPERSET of
    // the true ≥ minRepeat grams — no false negatives. Pass 2 recounts
    // EXACTLY, on gram strings, restricted to candidate postings (true
    // dups + the odd 2⁻⁶⁴ collision stray — a tiny fraction of the
    // corpus), so the final span decisions are still made on real
    // strings: BIT-IDENTICAL output to the single-pass formulation.
    //
    // The trade only pays when the posting stream dwarfs the exchange:
    // measured 27.0 s vs 84.5 s @10M docs and survival-vs-death @100M,
    // but at small corpora the extra counting pass is pure overhead
    // (q133 at sf0.1: +0.4 s). Below `singlePassMaxDocs` (one cheap
    // count() of the input — column-pruned parquet scan) the plan
    // drops to the direct string count; either path yields the same
    // bytes, pinned by SubstringDedupSpec's path-equivalence case.
    // Callers holding a derived input (gated/joined mid-pipeline frames
    // whose lineage is expensive to re-evaluate) pass `numDocsHint`
    // instead (round 12 ADVICE).
    val nDocs = if (numDocsHint >= 0L) numDocsHint else df.count()
    val hits =
      if (nDocs <= singlePassMaxDocs) {
        val dupGrams = grams.groupBy($"gram")
          .agg(count(lit(1)).as("c"))
          .filter($"c" >= minRepeat)
          .select($"gram")
        grams.join(dupGrams, Seq("gram")).select($"doc_id", $"pos")
      } else {
        val candHashes = grams.groupBy($"gh")
          .agg(count(lit(1)).as("c"))
          .filter($"c" >= minRepeat)
          .select($"gh")
        // cached: consumed by the exact recount AND the hits join; bounded
        // by true dup postings (+ collision strays), not the corpus
        val candPost = grams.join(candHashes, Seq("gh"))
          .select($"doc_id", $"pos", $"gram").cache()
        val dupGrams = candPost.groupBy($"gram")
          .agg(count(lit(1)).as("c"))
          .filter($"c" >= minRepeat)
          .select($"gram")
        candPost.join(dupGrams, Seq("gram")).select($"doc_id", $"pos")
      }

    // Gaps-and-islands on hit starts: running max of span-end over the
    // strictly-preceding frame; a hit opens a new island iff it starts
    // after that end + 1 (so overlapping and adjacent spans merge).
    val prev = Window.partitionBy($"doc_id").orderBy($"pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    val run = Window.partitionBy($"doc_id").orderBy($"pos")
      .rowsBetween(Window.unboundedPreceding, 0)
    val spans = hits
      .withColumn("is_new",
        when($"pos" > coalesce(max($"pos" + (k - 1)).over(prev), lit(-1L)) + 1,
          1L).otherwise(0L))
      .withColumn("island", sum($"is_new").over(run))
      .groupBy($"doc_id", $"island")
      .agg(min($"pos").as("s"), (max($"pos") + (k - 1)).as("e"))

    val docSpans = spans.groupBy($"doc_id").agg(
      sort_array(collect_list(struct($"s", $"e"))).as("sp"),
      count(lit(1)).as("n_spans"),
      sum($"e" - $"s" + 1L).as("dup_tokens"))

    // Map-side removal: keep token (1-based position p) iff no span
    // covers it. `withPos` is evaluated once per row; the lambdas
    // reference only attributes, so this stays O(tokens × spans) per row.
    val withPos = transform($"ts",
      (t, i) => struct((i + 1).cast("long").as("p"), t.as("tok")))
    val keptText = array_join(
      transform(
        filter(withPos,
          x => !exists($"sp", sp => x("p") >= sp("s") && x("p") <= sp("e"))),
        x => x("tok")),
      " ")

    toks.join(docSpans, Seq("doc_id"), "left")
      .select($"doc_id",
        size($"ts").cast("long").as("n_tokens"),
        coalesce($"n_spans", lit(0L)).as("n_spans"),
        coalesce($"dup_tokens", lit(0L)).as("dup_tokens"),
        when($"sp".isNull, array_join($"ts", " "))
          .otherwise(keptText).as("cleaned"))
  }
}
