package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-hygiene operators for LLM training-data pipelines: rule-based
  * quality filtering (the Gopher/MassiveText heuristics), cross-document
  * chunk-level exact deduplication (the CCNet/RefinedWeb line-dedup shape)
  * and train/test contamination detection by n-gram overlap.
  *
  * Design notes for 100 TB:
  *  - The rule battery is pure per-row Column algebra (split + higher-order
  *    array functions) — map-side only, no shuffle, no UDF, no state.
  *  - Chunk dedup shuffles twice, both times on bounded keys: once by chunk
  *    text (the global duplicate count — exactly how web-scale line dedup
  *    is run), once by doc id (reassembly). Chunks are ≤ `chunkTokens`
  *    tokens, so no key is unbounded; skew on a viral chunk is capped by
  *    the aggregation being a count/min, which combines map-side.
  *  - Contamination joins the test side's distinct grams against the
  *    train side's distinct grams — an equi-join on the gram, never a
  *    cartesian; the train gram set is the big side and stays distributed.
  *
  * All outputs are integers/booleans/md5 hex so every operator is
  * DuckDB-oracle-checkable bit-for-bit (see SparkEntry q65–q67).
  *
  * Heuristics follow the published Gopher rules (Rae et al. 2021,
  * "Scaling Language Models", table A1) re-expressed as integer
  * arithmetic so both engines compare exactly:
  * word count bounds, mean word length bounds, alphabetic-word fraction,
  * stopword presence, duplicate-2-gram fraction.
  */
object CorpusFilters {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** The session values Spark's `BloomFilterAggregate` silently
    * `Math.min`-clamps its (estimatedNumItems, numBits) literals to —
    * read here so [[bloomSizing]] can pre-apply the identical clamp. */
  def bloomConfMaxItems(spark: org.apache.spark.sql.SparkSession): Long =
    spark.conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "4000000").toLong
  def bloomConfMaxBits(spark: org.apache.spark.sql.SparkSession): Long =
    spark.conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864").toLong

  /** Effective (items, numBits) for the decontamination filter: the
    * auto-size (`bitsPerItem` bits per counted gram occurrence, 1024
    * floor, `maxBits` plan-footprint cap) pre-clamped to the session's
    * runtime bloomFilter confs so the literals handed to
    * `bloom_filter_agg` equal the values it actually builds with.
    * `BloomMirror.recompute` replays this exact function — one formula,
    * two callers, no drift. */
  def bloomSizing(occurrences: Long, bitsPerItem: Int, maxBits: Long,
      confMaxItems: Long, confMaxBits: Long): (Long, Long) = {
    val items = math.min(confMaxItems, math.max(1024L, occurrences))
    val numBits = math.min(math.min(maxBits, confMaxBits), items * bitsPerItem)
    (items, numBits)
  }

  /** Expected Bloom FP rate (1 - e^(-k·n/m))^k with the same
    * k = max(1, round(m/items·ln2)) the sketch library derives. */
  def bloomFpRate(occurrences: Long, items: Long, numBits: Long): Double = {
    val k = math.max(1L, math.round(numBits.toDouble / items * math.log(2)))
    math.pow(1 - math.exp(-k.toDouble * occurrences / numBits), k.toDouble)
  }

  /** Gram capacity of ONE conf-cap-sized filter at the requested FP
    * design point (`bitsPerItem` bits per occurrence): the item conf cap
    * and the bits-derived cap, whichever binds first. This is the shard
    * size of the sharded decontamination build. */
  def bloomShardCapacity(bitsPerItem: Int, maxBits: Long,
      confMaxItems: Long, confMaxBits: Long): Long =
    math.max(1L, math.min(confMaxItems, math.min(maxBits, confMaxBits) / bitsPerItem))

  /** Number of cap-sized filters needed for `occurrences` gram
    * occurrences at the design FP rate, bounded by `maxShards` (the
    * plan-footprint guard — beyond it the per-shard FP degrades
    * gracefully instead of the filter count growing without bound). */
  def bloomShardCount(occurrences: Long, bitsPerItem: Int, maxBits: Long,
      confMaxItems: Long, confMaxBits: Long, maxShards: Int): Int = {
    val cap = bloomShardCapacity(bitsPerItem, maxBits, confMaxItems, confMaxBits)
    val need = math.max(1L, (occurrences + cap - 1L) / cap)
    math.min(maxShards.toLong, need).toInt
  }

  /** Gopher's stopword list (table A1: "must contain ≥ 2 of ..."). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Lowercased whitespace tokens with empties dropped — mirrors DuckDB's
    * `list_filter(string_split_regex(lower(x),'\s+'), t -> t <> '')`.
    *
    * Runs through the codegen'd [[graft.expressions.WordTokens]] since
    * round 7 (the composed `filter(split(lower(text), "\\s+"), _ =!= "")`
    * pays an interpreted higher-order filter pass per row); the expression
    * delegates to the same UTF8String methods the builtins call, so the
    * output is bit-identical (`WordTokensExprSpec`). Built directly as a
    * Column (no function-registry lookup), so it works with any session —
    * the SQL name `graft_tokens` is registered separately by
    * `GraftFunctions.register` / `GraftExtensions`. */
  def words(text: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.WordTokens(
        org.apache.spark.sql.graft.ColumnBridge.expression(text)))

  /** Word n-grams joined by single spaces, 1-based positions — mirrors
    * DuckDB `list_transform(range(1, len(ts)-(n-2)), i -> ts[i] || ' ' ...)`
    * (empty when the doc has fewer than n words; null ts → null).
    *
    * Runs through the codegen'd [[graft.expressions.WordNGrams]]
    * expression since round 7 — the equivalent higher-order-function
    * formulation (`transform(sequence(1, len-n+1), i -> concat_ws(" ",
    * element_at(ts, i), ..., element_at(ts, i+n-1)))`) is interpreted and
    * pays n `element_at` evals per gram; bit-parity between the two is
    * pinned by `WordNGramsExprSpec`. */
  def wordNGrams(ts: Column, n: Int): Column = {
    require(n >= 1)
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.WordNGrams(
        org.apache.spark.sql.graft.ColumnBridge.expression(ts),
        org.apache.spark.sql.catalyst.expressions.Literal(n)))
  }

  /** Rule battery over a corpus: id, every metric (BIGINT), keep flag.
    *
    * Evaluation is STAGED: tokens, then gram arrays, then metrics — each
    * intermediate is a real projection column referenced several times
    * downstream, so the tokenizer runs once per row instead of once per
    * consumer. (Historical note: before round 7's codegen'd gram
    * expression this staging was load-bearing against an O(n²) hazard —
    * the HOF formulation re-evaluated an inlined tokenizer once per
    * `element_at`, measured 45× slower; the native expression evaluates
    * its child exactly once, but the multiple-reference argument still
    * holds and CollapseProject keeps the stages separate.)
    *
    * Keep/drop thresholds are pure integer comparisons (engine-exact):
    * 50 ≤ words ≤ 100k; mean word length in [3,10]; ≥80% of words contain
    * a letter; ≥1 stopword; duplicate-2-gram fraction < 20%. */
  def gopherRules(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val staged = df
      .select(col(idCol), words(col(textCol)).as("ts"))
      .select(col(idCol), col("ts"),
        wordNGrams(col("ts"), 2).as("g2"), wordNGrams(col("ts"), 3).as("g3"))
    staged.select(col(idCol),
        size(col("ts")).cast("bigint").as("n_words"),
        size(array_distinct(col("ts"))).cast("bigint").as("n_distinct_words"),
        aggregate(col("ts"), lit(0L), (acc, t) => acc + length(t)).as("n_word_chars"),
        size(filter(col("ts"), t => t.rlike("[a-z]"))).cast("bigint").as("n_alpha_words"),
        size(filter(col("ts"), t => t.isin(GopherStopwords: _*))).cast("bigint").as("n_stopwords"),
        (size(col("g2")) - size(array_distinct(col("g2")))).cast("bigint").as("dup_2grams"),
        size(col("g2")).cast("bigint").as("n_2grams"),
        (size(col("g3")) - size(array_distinct(col("g3")))).cast("bigint").as("dup_3grams"),
        size(col("g3")).cast("bigint").as("n_3grams"))
      .withColumn("keep",
        col("n_words").between(50L, 100000L) &&
          col("n_word_chars").between(col("n_words") * 3L, col("n_words") * 10L) &&
          col("n_alpha_words") * 10L >= col("n_words") * 8L &&
          col("n_stopwords") >= 1L &&
          col("dup_2grams") * 5L < col("n_2grams"))
  }

  /** Cross-document exact dedup of fixed-size token chunks (the
    * "paragraph"/line dedup of CCNet / RefinedWeb, re-keyed to
    * non-overlapping `chunkTokens`-token windows because this corpus has
    * no newlines): a chunk survives only at its globally first occurrence
    * (lowest doc id, then lowest position), documents are reassembled in
    * original chunk order.
    *
    * Returns (id, n_chunks, n_kept, cleaned) — `cleaned` is the surviving
    * text; docs with no words keep an empty string.
    */
  def chunkDedup(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int = 10): DataFrame = {
    require(chunkTokens >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    val toks = df.select(col(idCol).as("doc_id"), words(col(textCol)).as("ts"))
    // Column `/` is double division — truncate back to int (positive
    // operands, so truncation is the ceil-div we want).
    val nChunks = ((size($"ts") + (chunkTokens - 1)) / chunkTokens).cast("int")
    val chunks = toks
      .select($"doc_id", posexplode(
        when(size($"ts") === 0, array().cast("array<string>")).otherwise(
          transform(sequence(lit(0), nChunks - 1),
            i => concat_ws(" ", slice($"ts", i * chunkTokens + 1, lit(chunkTokens)))))))
      .toDF("doc_id", "pos", "chunk")
    // Global first occurrence = min(struct(doc_id, pos)) per chunk. This
    // is a hash aggregate with MAP-SIDE partial combine: a viral chunk
    // duplicated across billions of docs collapses to one candidate row
    // per map partition before the shuffle, so no reducer ever sees more
    // than #mapTasks rows for one chunk (a window over the chunk key
    // would send EVERY occurrence to a single task — skew-fatal).
    // The winners ARE the surviving rows, so no join back on the chunk
    // key is needed anywhere; everything downstream keys on doc id.
    val winners = chunks.groupBy($"chunk")
      .agg(min(struct($"doc_id", $"pos")).as("w"))
      .select($"w.doc_id".as("doc_id"), $"w.pos".as("pos"), $"chunk")
    // Per-doc totals (map-side combinable count) and reassembly: shuffles
    // keyed by doc id, which is unique per row upstream — no skew.
    val counts = chunks.groupBy($"doc_id").agg(count(lit(1)).as("n_chunks"))
    val rebuilt = winners.groupBy($"doc_id").agg(
      count(lit(1)).as("n_kept"),
      concat_ws(" ", transform(
        array_sort(collect_list(struct($"pos", $"chunk"))),
        s => s.getField("chunk"))).as("cleaned"))
    // Docs whose text has no words produce zero chunk rows — restore them.
    toks.select($"doc_id").join(counts, Seq("doc_id"), "left")
      .join(rebuilt, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n_chunks", lit(0L)).as("n_chunks"),
        coalesce($"n_kept", lit(0L)).as("n_kept"),
        coalesce($"cleaned", lit("")).as("cleaned"))
  }

  /** Benchmark-contamination check: for every document in the `test`
    * split, how many of its distinct word n-grams also occur anywhere in
    * the `train` split. The split is [[Sampling.deterministicSplit]]
    * (content-stable md5 buckets), so the same rows are train/test in
    * every engine and every run. Returns (doc_id, n_grams, n_shared,
    * contaminated) with `contaminated` = ≥ half the grams shared.
    *
    * `n` defaults to 13 — the standard contamination shingle width; the
    * shipped query uses 3 because the synthetic corpus' vocabulary makes
    * longer shingles all-unique (threshold choice is semantics-neutral:
    * the oracle recomputes whatever is configured).
    */
  /** PII redaction patterns, ordered: each is applied with
    * `regexp_replace(..., 'g')`. Kept to the regex subset that parses and
    * matches identically under Java regex (Spark) and RE2 (DuckDB, Go/Rust
    * scrubbers): no backrefs, no lookaround, explicit character classes.
    * Emails must run before IPs so `user@10.0.0.1`-style hosts are
    * swallowed by the email token. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\+[0-9]{1,2}[- ][0-9]{3}[- ][0-9]{3}[- ][0-9]{4}" -> "<PHONE>",
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b" -> "<IP>")

  /** Scrub emails / phone numbers / IPv4 literals to typed placeholder
    * tokens. Pure per-row `regexp_replace` chain — map-side, codegen'd, no
    * shuffle; at 100 TB this is embarrassingly parallel scan work. */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (pat, token)) =>
      regexp_replace(c, pat, token)
    }

  /** INTRA-document repetition removal (the within-page counterpart of
    * [[chunkDedup]], i.e. Gopher's "repetition" signal turned into a
    * transform): the document's non-overlapping `chunkTokens`-token chunks
    * are deduplicated keeping the FIRST occurrence, preserving order.
    *
    * Because a document is one row, the whole operator is per-row array
    * algebra (`array_distinct` preserves first-occurrence order) — no
    * shuffle, no UDF, no state; it scales like a map. Returns
    * (id, n_chunks, n_kept, cleaned). */
  def dropRepeatedChunks(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int = 3): DataFrame = {
    require(chunkTokens >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    val toks = df.select(col(idCol).as("doc_id"), words(col(textCol)).as("ts"))
    val nChunks = ((size($"ts") + (chunkTokens - 1)) / chunkTokens).cast("int")
    // Staged projection (chunks as a real column) for the same
    // lambda-inlining reason documented on [[gopherRules]].
    toks
      .select($"doc_id",
        when(size($"ts") === 0, array().cast("array<string>")).otherwise(
          transform(sequence(lit(0), nChunks - 1),
            i => concat_ws(" ", slice($"ts", i * chunkTokens + 1, lit(chunkTokens)))))
          .as("chunks"))
      .select($"doc_id", $"chunks", array_distinct($"chunks").as("kept"))
      .select($"doc_id",
        size($"chunks").cast("bigint").as("n_chunks"),
        size($"kept").cast("bigint").as("n_kept"),
        concat_ws(" ", $"kept").as("cleaned"))
  }

  def contamination(df: DataFrame, idCol: String, textCol: String,
      splits: Seq[(String, Double)], n: Int = 13): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // Grams are built AFTER an explode of start positions, not as arrays
    // fed INTO one: a higher-order-function-built array feeding Generate
    // measured 40× slower than the same work as a post-explode scalar
    // projection (everything here — sequence, element_at, concat_ws —
    // stays in whole-stage codegen). Per-doc gram dedup rides a
    // map-side-combining aggregate instead of array_distinct.
    val labeled = Sampling.deterministicSplit(df, idCol, splits)
      .filter($"split".isin("train", "test"))
      .select(col(idCol).as("doc_id"), $"split", words(col(textCol)).as("ts"))
    val positions = labeled.select($"doc_id", $"split", $"ts",
      explode(when(size($"ts") >= n, sequence(lit(1), size($"ts") - (n - 1)))
        .otherwise(array().cast("array<int>"))).as("i"))
    val grams = positions
      .select($"doc_id", $"split",
        concat_ws(" ", (0 until n).map(k => element_at($"ts", $"i" + lit(k))): _*).as("gram"))
      .distinct()
    val trainGrams = grams.filter($"split" === "train").select($"gram").distinct()
    val testGrams = grams.filter($"split" === "test").select($"doc_id", $"gram")
    val totals = testGrams.groupBy($"doc_id").agg(count(lit(1)).as("n_grams"))
    // Equi-join on the gram; count survivors per test doc. The train side
    // stays distributed — nothing is collected or broadcast by size
    // assumption (Catalyst may still broadcast it when it is small).
    val shared = testGrams.join(trainGrams, "gram")
      .groupBy($"doc_id").agg(count(lit(1)).as("n_shared"))
    totals.join(shared, Seq("doc_id"), "left")
      .select($"doc_id", $"n_grams",
        coalesce($"n_shared", lit(0L)).as("n_shared"))
      .withColumn("contaminated", $"n_shared" * 2L >= $"n_grams")
  }

  /** Bloom-filter decontamination — the SHUFFLE-FREE alternative to
    * [[contamination]]'s gram equi-join: flag every train doc containing
    * any test-set n-gram. The train side of the join variant exchanges
    * its whole gram stream on the gram key; here the test side (small by
    * construction — eval sets are curated) builds ONE Bloom filter with
    * `bloom_filter_agg` (a pure bitset: partial OR-merges are
    * associative/commutative/idempotent, so the bits are bit-identical
    * under any partitioning — unlike HLL's HIP estimator, measured in
    * `SketchGolden`), the ≤`numBits`-bit filter rides to executors as a
    * plan literal (the footprint class of a broadcast dim), and the
    * train side evaluates everything PER ROW: gram array → higher-order
    * `filter` with `might_contain` → counts. Zero shuffles, zero joins.
    *
    * Bloom guarantees NO FALSE NEGATIVES: every truly contaminated doc
    * is flagged. False positives (rate set by `numBits` vs the test
    * gram count) only quarantine extra docs — the conservative direction
    * for decontamination. Because the bitset is deterministic, even the
    * false positives are reproducible and externally oracle-able
    * (`BloomMirror` drives the same public sketch library — byte parity
    * with the distributed agg is pinned in `BloomDecontSpec`).
    *
    * The filter is AUTO-SIZED from the counted test gram stream
    * (`bitsPerItem` bits per occurrence, ~0.1% FP at the default 15) —
    * a fixed-size filter is the classic Bloom footgun, measured here at
    * 10M docs: a 2²³-bit filter sized for 2²⁰ items saturated on a 7M-
    * gram test split and flagged EVERY train doc. `maxBits` caps the
    * plan-literal footprint (16 MB at the default 2²⁷); beyond it the
    * FP rate degrades gracefully — switch to [[contamination]]'s exact
    * join or shard the test set if the eval corpus is that large.
    *
    * SIZING IS ALSO CLAMPED TO THE SESSION'S RUNTIME BLOOM CONFS:
    * Spark's `BloomFilterAggregate` silently applies
    * `Math.min(literal, spark.sql.optimizer.runtime.bloomFilter
    * .maxNumItems/.maxNumBits)` (defaults 4,000,000 items / 2²⁶ bits)
    * to whatever literals it is handed. Sizing here pre-clamps to the
    * same conf values via [[bloomSizing]] so the literals we pass ARE
    * the effective values — otherwise a >4M-gram test split would build
    * a silently-smaller distributed filter than the mirror replays and
    * diverge on false positives.
    *
    * SHARDED ABOVE THE CONF CAP (round 11): one cap-sized filter
    * saturates on a big eval suite — MEASURED at the 100M-doc decade:
    * 28.8% clean-doc FP at ~7M test grams against the (4M, 2²⁶) caps,
    * 100% at ~70M. So when the counted gram stream exceeds one filter's
    * design capacity ([[bloomShardCapacity]]), the build splits into
    * `nShards` cap-sized filters keyed by `pmod(xxhash64(gram),
    * nShards)` — ONE extra groupBy over the (small) test side, ≤
    * nShards collected rows — and the train-side probe picks the
    * matching shard per gram map-side (zero joins, zero train-side
    * shuffles): at ≤ `literalMaxShards` shards a CASE chain over
    * per-shard plan literals, above it ONE broadcast variable holding
    * every bitset probed by shard index
    * ([[graft.expressions.ShardedBloomProbe]], round 12 — the literal
    * chain measured ~131 MB of plan constants at 18 shards, serialized
    * into every task; the broadcast crosses the wire once per executor;
    * flags byte-identical either way). Per-shard OR-merge keeps the full determinism
    * story: every shard's bitset is partitioning-invariant, so the
    * mirror replays even the false positives byte-for-byte. `maxShards`
    * caps the plan footprint (default 64 × ≤8 MB conf-capped filters);
    * only beyond BOTH caps does the FP rate degrade, with a loud
    * warning (raise maxShards/the confs, or use the exact join).
    *
    * Output: (doc_id, n_grams, n_flagged, contaminated = n_flagged > 0);
    * null/short texts score (0, 0, false).
    */
  def bloomDecontaminate(train: DataFrame, test: DataFrame, idCol: String,
      textCol: String, n: Int = 3,
      bitsPerItem: Int = 15, maxBits: Long = 1L << 27,
      maxShards: Int = 64, literalMaxShards: Int = 4): DataFrame = {
    require(n >= 1 && bitsPerItem >= 1 && maxBits >= 1024 && maxShards >= 1,
      s"need n/bitsPerItem/maxShards >= 1 and maxBits >= 1024")
    require(literalMaxShards >= 1, "need literalMaxShards >= 1")
    import org.apache.spark.sql.graft.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.types.BinaryType
    val spark = train.sparkSession
    import spark.implicits._

    // cached so the tokenize+gram pass over the (small) test side runs
    // once for the sizing count and once more for the filter build
    val testGrams = test
      .select(explode(wordNGrams(words(col(textCol)), n)).as("gram"))
      .cache()
    // occurrences, not distinct (no dedup shuffle; an overestimate only
    // lowers the FP rate)
    val occurrences = testGrams.count()
    val confItems = bloomConfMaxItems(spark)
    val confBits = bloomConfMaxBits(spark)
    val nShards = bloomShardCount(occurrences, bitsPerItem, maxBits,
      confItems, confBits, maxShards)
    // uniform per-shard sizing from the GLOBAL count (ceil split): the
    // mirror replays this exact arithmetic, and one groupBy pass builds
    // every shard with the same literals
    val perShardOcc = (occurrences + nShards - 1L) / math.max(1L, nShards.toLong)
    val (items, numBits) = bloomSizing(perShardOcc, bitsPerItem, maxBits,
      confItems, confBits)
    if (numBits < math.min(maxBits, perShardOcc * bitsPerItem))
      log.warn(s"bloomDecontaminate: $nShards shards of $numBits bits still " +
        s"clamped for $occurrences gram occurrences (requested " +
        s"$bitsPerItem bits/item); per-shard estimated FP rate " +
        f"${bloomFpRate(perShardOcc, items, numBits)}%.4f — raise maxShards/" +
        "maxBits/the runtime.bloomFilter confs, or fall back to the exact " +
        "contamination join")
    // ≤ nShards bounded rows (each ≤ numBits bits however large the test
    // set is) — collected like IVF's centroid model; duplicate grams need
    // no dedup shuffle because Bloom insertion is idempotent
    val bfAgg = ColumnBridge.column(
      new BloomFilterAggregate(
        ColumnBridge.expression($"gh"),
        Literal(items), Literal(numBits)).toAggregateExpression())
    val bfByShard = new Array[Array[Byte]](nShards)
    testGrams.select(xxhash64($"gram").as("gh"))
      .groupBy(pmod($"gh", lit(nShards.toLong)).as("shard"))
      .agg(bfAgg.as("bf"))
      .collect()
      .foreach(r => bfByShard(r.getLong(0).toInt) = r.getAs[Array[Byte]](1))
    testGrams.unpersist()

    val grams = wordNGrams(words(col(textCol)), n)
    val flagged: Column => Column =
      if (occurrences == 0L) _ => lit(0) // empty test set: nothing to flag
      else if (nShards > literalMaxShards) { gs =>
        // BROADCAST-VARIABLE shards (round 12): above a few shards the
        // literal CASE chain below serializes every bitset into the
        // plan (~131 MB of plan constants MEASURED at 18 shards, ~0.5 GB
        // at the 64-shard envelope) and ships it with EVERY task — the
        // bitsets cross the wire once per executor as one broadcast
        // instead, probed by shard index through the same
        // BloomFilter.mightContainLong. Flags are byte-identical to the
        // literal path (same bitsets, same keying — BloomDecontSpec pins
        // the boundary); determinism story unchanged.
        val bcast = spark.sparkContext.broadcast(bfByShard)
        size(filter(gs, g => {
          val h = xxhash64(g)
          ColumnBridge.column(graft.expressions.ShardedBloomProbe(
            ColumnBridge.expression(pmod(h, lit(nShards.toLong))),
            ColumnBridge.expression(h), bcast))
        }))
      }
      else { gs =>
        size(filter(gs, g => {
          val h = xxhash64(g)
          def probe(s: Int): Column = ColumnBridge.column(
            BloomFilterMightContain(
              Literal(bfByShard(s), BinaryType),
              ColumnBridge.expression(h)))
          if (nShards == 1) probe(0)
          else {
            // CASE chain over the populated shards; a gram landing on an
            // empty shard (no test gram hashed there) cannot be flagged
            val sh = pmod(h, lit(nShards.toLong))
            (0 until nShards).filter(bfByShard(_) != null)
              .foldLeft(lit(false)) { (acc, s) =>
                when(sh === lit(s.toLong), probe(s)).otherwise(acc)
              }
          }
        }))
      }
    train.select(col(idCol).cast("long").as("doc_id"), grams.as("gs"))
      .select($"doc_id",
        coalesce(size($"gs"), lit(0)).cast("long").as("n_grams"),
        coalesce(flagged($"gs"), lit(0)).cast("long").as("n_flagged"))
      .withColumn("contaminated", $"n_flagged" > 0L)
  }
}
