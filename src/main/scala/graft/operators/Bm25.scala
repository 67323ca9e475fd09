package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 top-k lexical retrieval (Robertson–Spärck Jones / Okapi BM25 —
  * Robertson & Zaragoza 2009, "The Probabilistic Relevance Framework")
  * — the canonical keyword scorer a RAG pipeline runs beside the
  * embedding ANN retriever (q19/q38/q42): score every document against
  * each query's term set and keep the k best.
  *
  * Score, per (query, doc): Σ over the query's DISTINCT terms of
  * `idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))` with the
  * Lucene-shape `idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))` (always
  * > 0, so BM25's troublesome negative-idf regime never arises).
  * Tokenization is the corpus contract ([[CorpusFilters.words]]:
  * lower → split `\s+` → drop empties — exactly DuckDB's
  * `list_filter(string_split_regex(lower(text),'\s+'), t -> t <> '')`).
  *
  * Engine-exactness (the q134 precedent): each (query, term, doc)
  * contribution is computed in doubles from exact integer inputs
  * (tf, df, dl, N, Σdl) with BOTH engines evaluating the identical
  * expression tree, then rounded to e4 fixed point — ln is the only
  * non-correctly-rounded step and e4 granularity keeps an ulp flip
  * astronomically unlikely — so the per-(query, doc) sum is pure BIGINT:
  * partitioning- and merge-order-proof. Ranking ties break on doc id.
  *
  * 100 TB plan — one pruned index pass, no full-vocabulary state:
  *  1. queries (qid, term) are SMALL (a retrieval batch); their distinct
  *     term set broadcasts onto the exploded token stream BEFORE the
  *     posting aggregation, so the one big shuffle carries only tokens
  *     matching some query term (a serving deployment scoring arbitrary
  *     workloads would materialize the full posting index ONCE instead —
  *     same aggregation, no prune; this operator is the batch shape).
  *  2. dl rides the exploded rows (computed with the same `words` call,
  *     collapsed by CollapseProject into one tokenize) — document length
  *     never needs a big-side join.
  *  3. df per surviving term = posting row count per term — a
  *     query-term-bounded frame that broadcasts back; N and Σdl are a
  *     1-row broadcast (the q73/q90 bounds-row shape).
  *  4. the (qid, doc) score aggregation is the single unavoidable
  *     exchange; the top-k window rides a qid-bounded frame
  *     (≤ nQueries·candidates rows), never the corpus.
  */
object Bm25 {

  private val logger = org.slf4j.LoggerFactory.getLogger(getClass)

  /** The per-(query, term, doc) contribution column — ONE definition so
    * every consumer (batch shape, index probe, WAND floor pass)
    * provably evaluates the identical expression tree. Expects columns
    * tf, dl, df, n, sumdl in scope. */
  private def contributionE4(k1: Double, b: Double): Column = {
    val avgdl: Column = col("sumdl").cast("double") / col("n")
    val idf: Column =
      log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfPart: Column = (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * (col("dl") / avgdl)))
    round(idf * tfPart * lit(1e4)).cast("long")
  }

  /** The shared score-and-rank tail of both entry points: identical
    * expression tree (so the batch shape and the index shape are
    * bit-identical on the same postings), one (qid, doc) aggregation
    * exchange, top-k window on the qid-bounded score frame.
    *
    * `broadcastQueries = false` is the over-cap fallback shape: when the
    * caller's "retrieval batch" exceeds the loud cap (see
    * [[topKAgainstIndex]]'s `maxBatchPairs`), the query frame is NOT a
    * bounded driver model and must not be broadcast — the joins run as
    * plain shuffles (identical rows, corpus-scale cost, loudly
    * logged). */
  private def scoreAndRank(qStaged: DataFrame, postings: DataFrame,
      dfs: DataFrame, totals: DataFrame, k: Int,
      k1: Double, b: Double, broadcastQueries: Boolean = true): DataFrame = {
    val spark = qStaged.sparkSession
    import spark.implicits._
    // the query batch is SMALL by contract — broadcast it so the posting
    // stream is probed map-side (round 12: leaving this to AQE planned a
    // sort-merge join that shuffled the whole matching posting stream by
    // term — zipf-skewed — before scoring; measured +60% on the 10M
    // index-shape smoke)
    val bc: DataFrame => DataFrame =
      if (broadcastQueries) broadcast else identity
    // c_e4 depends only on (term, doc) facts (tf, dl, df, n, sumdl) —
    // never on qid — so it is computed ONCE per posting row BEFORE the
    // query join fans each posting out to every query sharing the term
    // (r17 optimization: the fanout previously re-evaluated the
    // ln-bearing double tree per (qid, term, doc) row; same expression
    // tree on the same inputs ⇒ bit-identical values, and the BIGINT
    // sum is order-free)
    val contrib = postings
      .join(bc(dfs.select($"term", $"df")), Seq("term"))
      .crossJoin(broadcast(totals))
      .select($"term", $"doc_id", contributionE4(k1, b).as("c_e4"))
    val scores = bc(qStaged)
      .join(contrib, Seq("term"))
      .groupBy($"qid", $"doc_id")
      .agg(sum($"c_e4").as("score_e4"))

    val w = Window.partitionBy($"qid")
      .orderBy($"score_e4".desc, $"doc_id".asc)
    scores
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= k)
      .select($"qid", $"rank", $"doc_id", $"score_e4")
  }

  /** @param queries (qid: BIGINT, term: STRING) — distinct rows, small
    *                (one retrieval batch; broadcast twice)
    * @return (qid, rank 1..k, doc_id, score_e4) for docs sharing ≥ 1
    *         term with the query */
  /** @param prune the same lossless WAND/maxscore bound the serving
    *   index runs (see [[topKAgainstIndex]]): per-term (max_tf, min_dl)
    *   come from the staged query-pruned postings for free, the floor
    *   pass re-reads that staged frame, and (qid, doc) groups that
    *   cannot reach the per-query top-k floor never enter the sort.
    *   Below `pruneMinPostings` matching postings the straight path
    *   wins and runs instead. At 100M the aggregation+sort is most of
    *   the batch shape's cost — the bound cuts it without losing a row
    *   (the 100M smoke's checksum equality pins it at scale;
    *   `Bm25Spec` pins pruned == unpruned at spec scale). */
  def topK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      prune: Boolean = true, floorTermsPerQuery: Int = 2,
      pruneMinPostings: Long = 2000000L,
      pruneMinMaxDf: Long = 1000000L,
      semiJoinMinPrunable: Long = 50000000L,
      maxBatchPairs: Long = 8000000L,
      spreadMinFanout: Long = 1000000L): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val spark = docs.sparkSession
    import spark.implicits._

    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
      CorpusFilters.words(col(textCol)).as("ts"))
    // 1-row corpus bounds: N docs, total token count (for avgdl)
    val totals = toks.agg(count(lit(1)).as("n"),
      coalesce(sum(size($"ts")), lit(0L)).cast("long").as("sumdl"))

    // the query batch feeds three consumers (term-set prune, df join,
    // scoring join) — stage the SMALL frame once instead of re-deriving
    // it per consumer (it may carry an upstream corpus scan, as q152's
    // does)
    val qProjected =
      queries.select(col("qid").cast("long").as("qid"), col("term"))
    // the loud batch cap (the Dedup.incrementalAssembled pattern): every
    // driver-side fold below — the stats collect, the WAND floor, the
    // query-pair collect — is bounded ONLY by the one-retrieval-batch
    // contract. A caller handing a corpus-sized "batch" used to get a
    // driver OOM; now it gets the fully-distributed exact path (no
    // broadcasts, no WAND — identical rows, corpus-scale cost) and a
    // warning saying so.
    // ONE bounded take replaces the count()+collect() job pair (r14
    // verdict directive: no per-probe driver jobs beyond what the
    // bounded model already needs). take() stops collecting at cap+1
    // rows, so an abusive corpus-sized "batch" costs the driver one
    // legal batch of rows, not a full materialization.
    val capProbe = (math.min(maxBatchPairs, Int.MaxValue - 2L) + 1L).toInt
    val qPairsRaw = qProjected.take(capProbe)
    if (qPairsRaw.length >= capProbe) {
      logger.warn(s"bm25 topK: query batch has > $maxBatchPairs (qid, " +
        s"term) pairs (maxBatchPairs) — falling back to the " +
        "fully-distributed exact path (no query broadcast, no WAND prune; " +
        "identical rows). Split the workload into bounded retrieval " +
        "batches to get the serving-shape plan back.")
      val qStaged = Stage.cut(qProjected)
      val qTermSet = qStaged.select($"term").distinct()
      val postings = Stage.cut(toks
        .select($"doc_id", size($"ts").cast("long").as("dl"),
          explode($"ts").as("term"))
        .join(qTermSet, Seq("term"), "left_semi")
        .groupBy($"doc_id", $"term")
        .agg(count(lit(1)).as("tf"), max($"dl").as("dl")))
      val dfs = postings.groupBy($"term").agg(count(lit(1)).as("df"))
      return scoreAndRank(qStaged, postings, dfs, totals, k, k1, b,
        broadcastQueries = false)
    }
    // bounded batch: rows already on the driver (the cap-check take) —
    // a LocalRelation stage (same rows, original schema) makes every
    // downstream read driver-local and every broadcast build jobless
    // (see topKAgainstIndex; the checkpointed frame cost one
    // materialization job plus a broadcast-build job per consumer)
    val qStaged = spark.createDataFrame(
      java.util.Arrays.asList(qPairsRaw: _*), qProjected.schema)
    val qTermSet = qStaged.select($"term").distinct()
    // prune the token stream to query terms BEFORE the tf aggregation:
    // the posting shuffle is bounded by matching tokens, not the corpus.
    // Stage the result — df aggregation AND the scoring join both read
    // it, and without the cut Catalyst re-runs the corpus explode +
    // aggregation once per consumer (two full index builds).
    val postings = Stage.cut(toks
      .select($"doc_id", size($"ts").cast("long").as("dl"),
        explode($"ts").as("term"))
      .join(broadcast(qTermSet), Seq("term"))
      .groupBy($"doc_id", $"term")
      .agg(count(lit(1)).as("tf"), max($"dl").as("dl")))

    // per-term stats over the staged pruned postings (df equals corpus
    // df for every query term) — a bounded collect (≤ batch terms) that
    // also drives the WAND bounds
    val stats = postings.groupBy($"term")
      .agg(count(lit(1)).as("df"), max($"tf").as("max_tf"),
        min($"dl").as("min_dl"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    val matchingPostings = stats.map(_._2).sum
    val maxTermDf = if (stats.isEmpty) 0L else stats.map(_._2).max
    // the scoring join fans each posting row out to every query sharing
    // its term — and the staged posting frame behind it was coalesced by
    // AQE (often to ONE partition at small matching volumes), so the
    // whole fanout + partial aggregation could run single-threaded
    // (measured: ~2 s in one task at a 5.4M-row fanout while 31 cores
    // idled). The fanout is exactly computable driver-side from the
    // collected stats (Σ_t df(t) · |qids sharing t|); spread the staged
    // frame back across the shuffle width when the fanout is worth
    // parallelizing — the repartition moves only the narrow matching
    // postings, orders of magnitude less than the work it parallelizes.
    val qPairs = qPairsRaw.map(r => (r.getLong(0), r.getString(1)))
    val nqByTerm = qPairs.groupBy(_._2).map { case (t, ps) =>
      (t, ps.map(_._1).distinct.length.toLong) }
    val fanout = stats.iterator
      .map(s => s._2 * nqByTerm.getOrElse(s._1, 0L)).sum
    val postingsSpread =
      if (fanout >= spreadMinFanout)
        postings.repartition(spark.sessionState.conf.numShufflePartitions)
      else postings
    if (!prune || matchingPostings < pruneMinPostings ||
        maxTermDf < pruneMinMaxDf) {
      logger.info(s"bm25 topK: straight scan-score-sort path " +
        s"($matchingPostings matching postings, max term df $maxTermDf; " +
        (if (!prune) "prune=false"
         else if (matchingPostings < pruneMinPostings)
           s"below pruneMinPostings=$pruneMinPostings"
         else s"max df below pruneMinMaxDf=$pruneMinMaxDf") + ")")
      val dfs = spark.createDataFrame(
        stats.toSeq.map { case (t, df, _, _) => (t, df) }).toDF("term", "df")
      return scoreAndRank(qStaged, postingsSpread, dfs, totals, k, k1, b)
    }
    logger.info(s"bm25 topK: WAND-bounded path ($matchingPostings matching " +
      s"postings >= pruneMinPostings=$pruneMinPostings, max term df " +
      s"$maxTermDf >= pruneMinMaxDf=$pruneMinMaxDf)")
    // the totals collect is the same 1-row aggregate job the unpruned
    // plan runs inside its broadcast — moved earlier, not added
    val tot = totals.collect()(0)
    wandScoreAndRank(qStaged, qPairs,
      stats, tot.getLong(0), tot.getLong(1), postingsSpread,
      terms => postings.filter($"term".isin(terms: _*)),
      k, k1, b, floorTermsPerQuery, semiJoinMinPrunable)
  }

  /** The shared WAND/maxscore-bounded score-and-rank tail of [[topK]]
    * and [[topKAgainstIndex]] — see topKAgainstIndex's scaladoc for the
    * losslessness argument (floor θ from exact partial scores of the
    * rarest terms; per-term ub evaluated at (max_tf, min_dl) through
    * the same IEEE-monotone expression tree the executors run).
    * `stats` must already be maxDf-filtered where that prune applies.
    *
    * Three pruning stages, each provably lossless:
    *  1. FLOOR (eager, bounded): θ_q = k-th best exact partial score
    *     over the query's `floorTermsPerQuery` rarest terms — collected
    *     (≤ nQueries rows, the retrieval-batch contract).
    *  2. ESSENTIAL-TERMS candidate semi-join (the maxscore split): per
    *     query, the LONGEST ub-ascending suffix S with Σ_{t∈S} ub < θ_q
    *     is non-essential — a doc matching ONLY S-terms scores
    *     ≤ Σ ub < θ_q, strictly below k docs. Candidates therefore come
    *     from the essential lists alone, and the main aggregation only
    *     processes candidate-matched posting rows — this is what cuts
    *     the AGGREGATION cost (the bound filter alone only starved the
    *     sort). The semi-join's (qid, doc) exchange replaces the
    *     aggregation exchange (same key — no extra big shuffle), so its
    *     marginal cost is the essential lists' second read. Skipped
    *     (logged) when the essential lists cover most matching postings
    *     anyway — the semi-join would only add work.
    *  3. BOUND filter after the aggregation: groups with Σ matched ub
    *     < θ_q never enter the top-k sort (free — the sum rides the
    *     aggregation; strictly tightens stage 2). */
  private def wandScoreAndRank(qStaged: DataFrame,
      qPairs: Array[(Long, String)],
      stats: Array[(String, Long, Long, Long)],
      n: Long, sumdl: Long,
      postings: DataFrame,
      floorPostingsOf: Seq[String] => DataFrame,
      k: Int, k1: Double, b: Double, floorTermsPerQuery: Int,
      semiJoinMinPrunable: Long): DataFrame = {
    val spark = qStaged.sparkSession
    import spark.implicits._
    val avgdl = sumdl.toDouble / n.toDouble
    // ub is evaluated at (max_tf, min_dl) through the same IEEE-monotone
    // double tree the executors run for c_e4 — EXCEPT the final
    // rounding: executors round via Spark's `round` (BigDecimal
    // HALF_UP), this driver-side bound via `math.round` (floor(x+0.5)).
    // For the positive values BM25 produces, math.round(x) >= HALF_UP
    // rounding of x (they differ only on ties, where floor(x+0.5) rounds
    // up and HALF_UP also rounds up — and on doubles-near-ties
    // math.round never rounds LOWER), so the asymmetry is deliberately
    // safe: ub_e4 >= c_e4 survives it. Do not "fix" the mismatch by
    // making ub round half-even or truncate — that could round a tie
    // DOWN and break the losslessness invariant.
    def ubE4(df: Long, maxTf: Long, minDl: Long): Long = {
      val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
      val tfp = (maxTf * (k1 + 1.0)) /
        (maxTf + k1 * (1.0 - b + b * (minDl / avgdl)))
      math.round(idf * tfp * 1e4)
    }
    val dfs = spark.createDataFrame(stats.toSeq
        .map { case (t, df, mtf, mdl) => (t, df, ubE4(df, mtf, mdl)) })
      .toDF("term", "df", "ub_e4")
    val totals = Seq((n, sumdl)).toDF("n", "sumdl")
    val keptSet = stats.map(_._1).toSet
    val dfOf = stats.map(t => (t._1, t._2)).toMap
    val ubOf = stats.map(t => (t._1, ubE4(t._2, t._3, t._4))).toMap
    val qKept = qPairs.filter(p => keptSet(p._2)).groupBy(_._1)
      .map { case (qid, ps) => (qid, ps.map(_._2).distinct) }
    // 1. FLOOR: exact partial scores over each query's rarest kept
    // terms; the rank-k row per qid is θ — collected (bounded by the
    // retrieval-batch contract) so stage 2's term split can happen
    // driver-side
    val floorPairs = qKept.toSeq.flatMap { case (qid, terms) =>
      terms.sortBy(t => (dfOf(t), t)).take(floorTermsPerQuery)
        .map(t => (qid, t))
    }
    val wTop = Window.partitionBy($"qid")
      .orderBy($"score_e4".desc, $"doc_id".asc)
    val thetaMap: Map[Long, Long] =
      spark.createDataFrame(floorPairs).toDF("qid", "term")
        .join(floorPostingsOf(floorPairs.map(_._2).distinct), Seq("term"))
        .join(broadcast(dfs.select($"term", $"df")), Seq("term"))
        .crossJoin(broadcast(totals))
        .select($"qid", $"doc_id", contributionE4(k1, b).as("c_e4"))
        .groupBy($"qid", $"doc_id").agg(sum($"c_e4").as("score_e4"))
        .withColumn("rank", row_number().over(wTop))
        .filter($"rank" === k)
        .select($"qid", $"score_e4")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // 2. ESSENTIAL split: drop the longest ub-ascending suffix whose
    // bound sum stays under θ; a query with no floor (< k floor rows)
    // keeps every term essential. E is never empty: θ is an ACHIEVED
    // partial score, so Σ of ALL matched ubs ≥ θ and the full set never
    // qualifies as a droppable suffix (guarded anyway).
    val qEssential = qKept.toSeq.flatMap { case (qid, terms) =>
      val essential = thetaMap.get(qid) match {
        case None => terms
        case Some(theta) =>
          val byUbDesc = terms.sortBy(t => (-ubOf(t), t))
          var acc = 0L
          var cut = byUbDesc.length
          while (cut > 1 && acc + ubOf(byUbDesc(cut - 1)) < theta) {
            acc += ubOf(byUbDesc(cut - 1)); cut -= 1
          }
          byUbDesc.take(cut)
      }
      essential.map(t => (qid, t))
    }
    val essentialDf = qEssential.map(p => dfOf(p._2)).sum
    val totalDf = qKept.toSeq.flatMap { case (_, ts) => ts.map(dfOf) }.sum
    val thetas = broadcast(spark.createDataFrame(
        thetaMap.toSeq).toDF("qid", "theta"))
    // c_e4/ub_e4 are (term, doc) facts — computed once per posting row
    // before the query fanout (see scoreAndRank; bit-identical values)
    val contribRows = postings
      .join(broadcast(dfs), Seq("term"))
      .crossJoin(broadcast(totals))
      .select($"term", $"doc_id", contributionE4(k1, b).as("c_e4"), $"ub_e4")
    val scoredRows = broadcast(qStaged)
      .join(contribRows, Seq("term"))
      .select($"qid", $"doc_id", $"c_e4", $"ub_e4")
    // semi-join only when the prunable posting volume amortizes its
    // fixed costs (re-reading the essential lists + the per-partition
    // candidate hash map): at 10M docs the index probe LOST ~6 s to it
    // while the aggregation it relieves was not yet spill-bound. Both
    // gates are exact driver-side numbers, never estimates.
    val prunable = totalDf - essentialDf
    val bounded =
      if (totalDf == 0L || prunable < semiJoinMinPrunable ||
          essentialDf.toDouble / totalDf > 0.75) {
        if (totalDf > 0L)
          logger.info(s"bm25 wand: candidate semi-join skipped " +
            s"(prunable postings $prunable below $semiJoinMinPrunable, " +
            f"or essential lists cover ${essentialDf.toDouble / totalDf * 100}%.0f%% " +
            "of matches) — the bound filter still applies")
        scoredRows
      } else {
        logger.info(s"bm25 wand: candidate semi-join ENGAGED " +
          s"(prunable postings $prunable >= $semiJoinMinPrunable, " +
          f"essential lists cover ${essentialDf.toDouble / totalDf * 100}%.0f%% " +
          "of matches)")
        val candidates = spark.createDataFrame(qEssential).toDF("qid", "term")
          .join(floorPostingsOf(qEssential.map(_._2).distinct), Seq("term"))
          .select($"qid", $"doc_id")
        // shuffle_hash, not sort-merge: SMJ would SORT the full scored
        // stream — the very cost the prune exists to avoid (measured:
        // the unhinted plan gave the 10M index probe back its sort,
        // 29.6 → 41.5 s); hashing the candidate side costs its
        // partition-local map only, and the join's (qid, doc) exchange
        // doubles as the aggregation exchange
        scoredRows.join(candidates.hint("shuffle_hash"),
          Seq("qid", "doc_id"), "left_semi")
      }
    bounded
      .groupBy($"qid", $"doc_id")
      .agg(sum($"c_e4").as("score_e4"), sum($"ub_e4").as("ub_sum_e4"))
      .join(thetas, Seq("qid"), "left")
      .filter($"ub_sum_e4" >= coalesce($"theta", lit(Long.MinValue)))
      .withColumn("rank", row_number().over(wTop).cast("long"))
      .filter($"rank" <= k)
      .select($"qid", $"rank", $"doc_id", $"score_e4")
  }

  /** Materialize the BM25 posting index ONCE — the serving shape for
    * arbitrary query workloads ([[topK]] is the batch shape: it rebuilds
    * the query-pruned index per call, which is right for one retrieval
    * batch and wasteful for many). Three tables:
    *
    *  - `{table}_postings` (tb, term, doc_id, tf, dl) — DIRECTORY-
    *    partitioned by `tb = pmod(xxhash64(term), nDirs)` and term-sorted
    *    within each file
    *  - `{table}_dfs`      (tb, term, df) — same layout
    *  - `{table}_bounds`   1 row (n, sumdl, n_dirs)
    *
    * WHY hash-dir partitions rather than `bucketBy(term)` (round 12,
    * measured): the probe's pruning predicate is a multi-value term-IN —
    * Spark prunes PARTITION DIRECTORIES for an IN on a partition column
    * at planning time, while a bucketed layout only prunes buckets (not
    * row groups across a scan whose IN list defeats parquet's min/max
    * range rewrite). With dirs, a selective retrieval batch touches only
    * the directories its terms hash into, and the term sort inside each
    * file gives row-group skipping on top. Our term-joins broadcast the
    * query side, so bucketing's exchange-free-join property buys nothing
    * here.
    *
    * The tb repartition feeding the posting write is the ONE full-corpus
    * shuffle the index amortizes — tf is computed INSIDE each row
    * ([[termCountsUdf]]), so there is no posting-aggregation exchange,
    * and dfs is derived from the WRITTEN postings (a columnar (tb, term)
    * scan of the index itself) rather than a checkpointed copy of the
    * posting stream — both decisions are what let the build fit local
    * disk at the 100M decade. The corpus is tokenized twice (posting
    * pass + the bounds aggregate) — two map passes, zero extra
    * exchanges; n counts EVERY doc including empty ones, exactly like
    * [[topK]]'s totals. */
  /** Per-document (term, tf) pairs computed INSIDE the row — tf is an
    * intra-document fact, so aggregating it needs no exchange at all.
    * The batch shape ([[topK]]) keeps its explode + groupBy because its
    * token stream is query-pruned first (tiny); the index build has no
    * query to prune by, and a groupBy over the FULL token stream was the
    * 100M-decade disk killer (a second full-corpus shuffle on top of the
    * tb repartition). */
  private val termCountsUdf = udf { ts: Seq[String] =>
    if (ts == null) Seq.empty[(String, Long)]
    else {
      val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      ts.foreach(t => m.update(t, m.getOrElse(t, 0L) + 1L))
      m.toSeq
    }
  }

  /** The (tb, term, doc_id, tf, dl) posting frame of a doc batch — the
    * shared construction of [[buildIndex]] and [[appendToIndex]]. One
    * shuffle-free map pass (tokenize → intra-row term counts → explode);
    * the only exchange in the build is [[writeDirs]]'s tb repartition. */
  private def postingsOf(docs: DataFrame, idCol: String, textCol: String,
      nDirs: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"),
        CorpusFilters.words(col(textCol)).as("ts"))
      .select($"doc_id", size($"ts").cast("long").as("dl"),
        explode(termCountsUdf($"ts")).as("tc"))
      .select(pmod(xxhash64($"tc._1"), lit(nDirs.toLong)).as("tb"),
        $"tc._1".as("term"), $"doc_id", $"tc._2".as("tf"), $"dl")
  }

  /** The 1-row (n, sumdl) corpus bounds of a doc batch. */
  private def boundsOf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(CorpusFilters.words(col(textCol)).as("ts"))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(size($"ts")), lit(0L)).cast("long").as("sumdl"))
  }

  private def writeDirs(df: DataFrame, name: String, path: String): Unit = {
    val spark = df.sparkSession
    df.repartition(col("tb"))
      .sortWithinPartitions(col("tb"), col("term"))
      .write.format("parquet").option("path", path)
      .partitionBy("tb").mode("overwrite").saveAsTable(name)
  }

  /** Doc ids must be UNIQUE within `docs` (the same contract
    * [[appendToIndex]] states for batches): [[postingsOf]] computes tf
    * INSIDE each row, so two rows sharing an id emit two posting rows
    * per shared term — that doc's score contributions and df are
    * double-counted with no error raised. Dedup upstream (q16's exact
    * dedup) if the source can repeat ids. */
  def buildIndex(docs: DataFrame, idCol: String, textCol: String,
      table: String, path: String, nDirs: Int = 64): Unit =
    graft.sources.Generations.withMaintenanceLock(table) {
    require(nDirs >= 1, s"need nDirs >= 1, got $nDirs")
    val spark = docs.sparkSession
    import spark.implicits._
    import graft.sources.Generations
    // every live name is a Generations VIEW over generation tables, so
    // maintenance flips are one atomic catalog op each (no window in
    // which a probe sees a missing or half-swapped table). Each member
    // generation is RESERVED (unique name + path even under racing
    // writers) and committed with the CAS form — a rebuild racing
    // another maintenance op loses loudly instead of clobbering it.
    // Reserving also makes rebuild-over-an-existing-index safe for
    // concurrent probes: the fresh build lands as a NEW generation
    // behind the usual atomic flip (the old shape overwrote g0's files
    // in place while the live view served them).
    val pBase = Generations.currentOpt(spark, s"${table}_postings")
    val pGen = Generations.reserve(spark, s"${table}_postings")
    writeDirs(postingsOf(docs, idCol, textCol, nDirs), pGen,
      Generations.genPath(s"$path/postings", pGen))
    Generations.commit(spark, s"${table}_postings", pGen, pBase)
    // dfs derived FROM the written postings — a (tb, term)-pruned
    // columnar scan of the index itself, already tb-partitioned on disk.
    // The previous form checkpointed the whole posting stream to feed
    // both writes: at the 100M decade that uncompressed copy (plus the
    // extra shuffle it fed) exceeded local disk before the index itself
    // was a problem. max_tf/min_dl ride the same aggregation: the
    // per-term WAND/maxscore score bound the probe's lossless top-k
    // prune evaluates at query time (tfPart is increasing in tf and
    // decreasing in dl, so (max_tf, min_dl) bounds every posting's
    // contribution under ANY future avgdl — append-safe by max/min
    // merge).
    val dBase = Generations.currentOpt(spark, s"${table}_dfs")
    val dGen = Generations.reserve(spark, s"${table}_dfs")
    writeDirs(spark.table(pGen)
        .groupBy($"tb", $"term").agg(count(lit(1)).as("df"),
          max($"tf").as("max_tf"), min($"dl").as("min_dl")),
      dGen, Generations.genPath(s"$path/dfs", dGen))
    Generations.commit(spark, s"${table}_dfs", dGen, dBase)
    val bBase = Generations.currentOpt(spark, s"${table}_bounds")
    val bGen = Generations.reserve(spark, s"${table}_bounds")
    boundsOf(docs, idCol, textCol)
      .withColumn("n_dirs", lit(nDirs.toLong))
      .write.format("parquet")
      .option("path", Generations.genPath(s"$path/bounds", bGen))
      .mode("overwrite").saveAsTable(bGen)
    Generations.commit(spark, s"${table}_bounds", bGen, bBase)
    // empty tombstone list, so deleteFromIndex/probes have it by
    // construction (probes still tolerate absence for pre-delete indexes)
    graft.sources.Tombstones.init(spark, table, s"$path/deletes")
    recordSnapshot(spark, table, "build", revertible = true)
  }

  /** One manifest row in the family snapshot log per maintenance
    * commit — what [[graft.sources.Snapshots.resolveStateAsOf]] replays
    * for time-travel probes ([[topKAgainstIndex]]'s `asOfCommits`). The
    * postings member is file-tracked: appends mutate its generation in
    * place, so each commit records its exact file list — that is what
    * lets a historical probe cross an append commit. */
  private def recordSnapshot(spark: org.apache.spark.sql.SparkSession,
      table: String, op: String, revertible: Boolean,
      addedFiles: Map[String, Seq[String]] = Map.empty): Unit =
    graft.sources.Snapshots.record(spark, table, op, revertible,
      Seq(s"${table}_postings", s"${table}_dfs", s"${table}_bounds",
        s"${table}_deletes"),
      s"${table}_postings",
      fileTracked = Set(s"${table}_postings"),
      addedFiles = addedFiles)

  // ---- append crash recovery (r15 directive 4) ---------------------
  // Property tagging the dfs generation with the append batch that
  // produced it — recovery's commit detector — and the bounds
  // generation with the batch whose delta it last applied — recovery's
  // exactly-once guard for the additive counters.
  private val batchProp = "graft.batch"
  private val appliedBatchProp = "graft.applied_batch"

  /** Test seam: set to a crash-point name to make the next matching
    * point throw, simulating a JVM death there; cleared on fire. The
    * points are the two halves of the append's commit window:
    * `bm25.append.afterDfsCommit` (nothing moved yet) and
    * `bm25.append.afterMove` (postings in, bounds not applied). */
  private[graft] var testCrashPoint: String = ""
  private def crashPoint(name: String): Unit =
    if (testCrashPoint == name) {
      testCrashPoint = ""
      throw new RuntimeException(s"simulated crash at $name (test seam)")
    }

  /** Test seams for the lease-TTL-outrun races (r16 ADVICE): run a
    * foreign recoverer's action at the exact interleaving point —
    * after the pending sidecar lands (a rollback can race the dfs
    * commit) and after the dfs commit (a roll-forward can race the
    * move/bounds/record half). Cleared after firing. */
  private[graft] var testAfterPendingHook: () => Unit = () => ()
  private[graft] var testAfterDfsCommitHook: () => Unit = () => ()
  private def fireHook(get: () => () => Unit, set: (() => Unit) => Unit): Unit = {
    val h = get(); set(() => ()); h()
  }

  /** The pending-append sidecar beside the index (`_`-prefixed: never a
    * data file to any listing): the batch's staged file list plus its
    * additive bounds delta — everything recovery needs to roll the
    * append forward without the dead JVM. */
  private def pendingPath(spark: org.apache.spark.sql.SparkSession,
      table: String, batchId: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(graft.sources.Generations
        .basePath(spark, s"${table}_postings")).getParent,
      s"_pending_append_$batchId")

  private def writePending(spark: org.apache.spark.sql.SparkSession,
      table: String, batchId: String, stage: String, n: Long,
      sumdl: Long, files: Seq[String]): Unit = {
    val p = pendingPath(spark, table, batchId)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try {
      val sb = new StringBuilder
      sb.append(s"stage=$stage\n").append(s"n=$n\n").append(s"sumdl=$sumdl\n")
      files.foreach(f => sb.append(s"file=$f\n"))
      out.write(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } finally out.close()
  }

  private def deletePending(spark: org.apache.spark.sql.SparkSession,
      table: String, batchId: String): Unit = {
    val p = pendingPath(spark, table, batchId)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, false)
  }

  /** Generation-relative paths of the staged batch's data files. */
  private def listStagedFiles(fs: org.apache.hadoop.fs.FileSystem,
      stageP: org.apache.hadoop.fs.Path): Seq[String] = {
    if (!fs.exists(stageP)) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    fs.listStatus(stageP)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("tb="))
      .foreach { tbDir =>
        fs.listStatus(tbDir.getPath)
          .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
            !f.getPath.getName.startsWith("."))
          .foreach(f =>
            out += s"${tbDir.getPath.getName}/${f.getPath.getName}")
      }
    out.toSeq.sorted
  }

  /** IDEMPOTENT staged-file move: renames whatever still sits in the
    * stage; entries whose source is gone were moved by a previous
    * attempt (file names carry the write job's UUID, so a present
    * destination is always THIS batch's own earlier move). */
  private def moveStagedIn(fs: org.apache.hadoop.fs.FileSystem,
      stageP: org.apache.hadoop.fs.Path,
      pDest: org.apache.hadoop.fs.Path, files: Seq[String]): Unit =
    files.foreach { rel =>
      val src = new org.apache.hadoop.fs.Path(stageP, rel)
      val dest = new org.apache.hadoop.fs.Path(pDest, rel)
      if (fs.exists(src)) {
        if (!fs.exists(dest.getParent)) fs.mkdirs(dest.getParent)
        // src-or-dest tolerance (r16 ADVICE): a recoverer rolling this
        // batch forward concurrently (the op outran its lease TTL) may
        // win the rename race — a failed rename with the destination
        // present is its move, not an error
        if (!fs.rename(src, dest))
          require(fs.exists(dest),
            s"bm25 append: rename $src -> $dest failed and the " +
              "destination is absent")
      } else require(fs.exists(dest),
        s"bm25 append: staged file $rel exists at neither the stage " +
          "nor the destination — the batch is lost past its df commit; " +
          "rebuild the index (r16 ADVICE: never record files that " +
          "never landed)")
    }

  /** Add the batch's (n, Σdl) to the bounds table — a fresh tagged
    * generation behind an atomic flip, with an UNBOUNDED
    * re-read-and-retry on a lost CAS: a cross-JVM append committing its
    * bounds concurrently must ADD to ours, not erase it (both
    * contributions are additive), so the loser re-reads the moved
    * bounds and re-adds its batch. The retry must never exhaust: at
    * this point the staged postings are MOVED IN and the dfs merge
    * COMMITTED, so letting ConcurrentMaintenanceException escape would
    * hand the documented retryOnConcurrentMaintenance wrapper a
    * half-committed append to replay — duplicating postings and
    * double-counting df (r15 ADVICE). It always converges: each lost
    * round means another writer COMMITTED (system-wide progress). The
    * batch tag on the committed generation is what makes the delta
    * exactly-once under crash recovery. */
  private def addBoundsTagged(spark: org.apache.spark.sql.SparkSession,
      table: String, addN: Long, addSumdl: Long, batchId: String): Unit = {
    import spark.implicits._
    import graft.sources.Generations
    var committed = false
    var attempts = 0
    while (!committed) {
      attempts += 1
      val bCur = Generations.ensureGen(spark, s"${table}_bounds")
      // exactly-once ACROSS WRITERS, not just across recovery calls
      // (r16 ADVICE): a recoverer rolling this batch forward in another
      // JVM may have applied the delta already — the live append's and
      // the recovery's adds both funnel through this tag check, re-read
      // on every CAS round
      if (spark.sessionState.catalog.getTableMetadata(
            org.apache.spark.sql.catalyst.TableIdentifier(bCur))
          .properties.get(appliedBatchProp).contains(batchId)) {
        logger.warn(s"bm25 append: bounds delta of batch $batchId is " +
          "already applied (a recovery in another JVM completed it) — " +
          "skipping")
        return
      }
      val rows = spark.table(bCur).collect()
      require(rows.length == 1,
        s"index ${table}_bounds must hold exactly 1 row")
      val nextB = Generations.reserve(spark, s"${table}_bounds")
      Seq((rows(0).getLong(0) + addN, rows(0).getLong(1) + addSumdl,
          rows(0).getLong(2)))
        .toDF("n", "sumdl", "n_dirs")
        .write.format("parquet")
        .option("path", Generations.genPath(
          Generations.basePath(spark, s"${table}_bounds"), nextB))
        .mode("overwrite").saveAsTable(nextB)
      spark.sql(s"ALTER TABLE $nextB SET TBLPROPERTIES " +
        s"('$appliedBatchProp' = '$batchId')")
      try {
        Generations.commit(spark, s"${table}_bounds", nextB, Some(bCur))
        committed = true
      } catch {
        case e: graft.sources.ConcurrentMaintenanceException =>
          logger.warn(s"bm25 append: bounds CAS lost a cross-JVM race " +
            s"(attempt $attempts) — re-reading and re-adding: $e")
      }
    }
  }

  /** Recover an [[appendToIndex]] that died mid-commit — called
    * automatically at the start of every maintenance op, and available
    * directly for an operator who just restarted a dead ingest job.
    * Keyed on the pending sidecar [[writePending]] left behind:
    *
    *  - if the current dfs generation carries the pending batch's tag,
    *    the df merge COMMITTED — roll FORWARD: replay the staged-file
    *    renames (idempotent — sources already moved are skipped), apply
    *    the bounds delta unless the current bounds generation is
    *    already tagged with the batch (exactly-once), and record the
    *    snapshot commit so the add-file log sees the batch (duplicate
    *    rows from a crash-after-record are deduped by the fold);
    *  - otherwise the merge never committed — roll BACK: delete the
    *    stage and the sidecar, index untouched (re-run the batch).
    *
    * A crash DURING recovery re-enters the same decision tree and
    * converges: every step is idempotent or tagged. */
  def recoverPendingAppend(spark: org.apache.spark.sql.SparkSession,
      table: String): Unit =
      graft.sources.Generations.withMaintenanceLock(table) {
    import graft.sources.Generations
    val cat = spark.sessionState.catalog
    if (!cat.tableExists(org.apache.spark.sql.catalyst.TableIdentifier(
        s"${table}_postings"))) return
    val parent = new org.apache.hadoop.fs.Path(
      Generations.basePath(spark, s"${table}_postings")).getParent
    val fs = parent.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(parent)) return
    val pendings = fs.listStatus(parent).filter(s =>
      s.isFile && s.getPath.getName.startsWith("_pending_append_"))
    if (pendings.isEmpty) return
    pendings.sortBy(_.getPath.getName).foreach { pend =>
      val batchId = pend.getPath.getName.stripPrefix("_pending_append_")
      val in = fs.open(pend.getPath)
      val lines =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
        finally in.close()
      val stageOpt = lines.find(_.startsWith("stage="))
        .map(_.stripPrefix("stage="))
      val dGen = Generations.ensureGen(spark, s"${table}_dfs")
      val committed = cat.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(dGen))
        .properties.get(batchProp).contains(batchId)
      if (!committed) {
        // the merge never committed (or a partial sidecar from a crash
        // mid-write — which implies the same): the index is untouched
        logger.warn(s"bm25 $table: rolling BACK pending append $batchId " +
          "— its df merge never committed; re-run the batch")
        stageOpt.foreach(sp =>
          fs.delete(new org.apache.hadoop.fs.Path(sp), true))
        fs.delete(pend.getPath, false)
      } else {
        logger.warn(s"bm25 $table: rolling FORWARD pending append " +
          s"$batchId — its df merge committed but the staged move " +
          "and/or bounds delta did not finish")
        val n = lines.find(_.startsWith("n="))
          .getOrElse(throw new IllegalStateException(
            s"pending append $batchId sidecar is truncated but its df " +
              "merge committed — should be impossible (the sidecar is " +
              "fully written before the merge); rebuild the index"))
          .stripPrefix("n=").toLong
        val sumdl = lines.find(_.startsWith("sumdl=")).get
          .stripPrefix("sumdl=").toLong
        val files = lines.filter(_.startsWith("file="))
          .map(_.stripPrefix("file="))
        val pGen = Generations.ensureGen(spark, s"${table}_postings")
        val pDest = new org.apache.hadoop.fs.Path(
          Generations.location(spark, pGen))
        val stage = new org.apache.hadoop.fs.Path(stageOpt.get)
        moveStagedIn(fs, stage, pDest, files)
        fs.delete(stage, true)
        spark.sql(s"ALTER TABLE $pGen RECOVER PARTITIONS")
        spark.catalog.refreshTable(pGen)
        val bGen = Generations.ensureGen(spark, s"${table}_bounds")
        val boundsApplied = cat.getTableMetadata(
            org.apache.spark.sql.catalyst.TableIdentifier(bGen))
          .properties.get(appliedBatchProp).contains(batchId)
        if (!boundsApplied) addBoundsTagged(spark, table, n, sumdl, batchId)
        recordSnapshot(spark, table, "append-recovery", revertible = false,
          addedFiles = Map(s"${table}_postings" -> files))
        fs.delete(pend.getPath, false)
      }
    }
  }

  /** The documents [[appendToIndex]] commits in `(fromId, toId]` added
    * to the serving index — the incremental-consumer read ("which docs
    * entered the corpus since the state I last processed"), resolved
    * from the snapshot log's add-file deltas
    * ([[graft.sources.Snapshots.readAddedBetween]] over the postings
    * member, distinct doc ids): O(window) metadata, a pinned scan of
    * exactly the appended posting files, zero directory walks.
    * Endpoints come from [[graft.sources.Snapshots.commitIdFor]]
    * (depth / timestamp / tag); compaction commits inside the window
    * are transparent; a takedown (`delete`) inside it refuses unless
    * `ignoreDeletes` (then anti-join the live tombstone list —
    * [[graft.sources.Tombstones.frame]] — to drop since-deleted ids,
    * which is exactly what q190 demonstrates). */
  def docsAddedBetween(spark: org.apache.spark.sql.SparkSession,
      table: String, fromId: Long, toId: Long,
      ignoreDeletes: Boolean = false): DataFrame =
    graft.sources.Snapshots.readAddedBetween(spark, table,
        s"${table}_postings", fromId, toId, ignoreDeletes)
      .select(col("doc_id")).distinct()

  /** DELETE documents from a [[buildIndex]] index — the takedown
    * primitive (a removal request must stop serving a document NOW, not
    * at the next rebuild). Lucene-style tombstones
    * ([[graft.sources.Tombstones]]): the ids merge into a tiny
    * `{table}_deletes` list (fresh generation, atomic flip — a
    * concurrent probe reads the complete previous list, stale by one
    * batch at worst) and every probe anti-joins its posting frames
    * against it, so the documents vanish from all rankings immediately
    * at batch cost — no posting rewrite. The next [[compactIndex]]
    * folds the tombstones physically and resets the list.
    *
    * Ranking semantics (what the q170 oracle pins): deleted documents
    * are EXCLUDED from every ranking; corpus statistics (df, N, Σdl)
    * keep describing the historical corpus until a rebuild — exactly
    * Lucene's trade (its deletes don't update df either). This is also
    * what keeps every surviving document's SCORE unchanged by a delete
    * (only ranks shift upward) and rankings invariant across the
    * folding compaction. A deleted id stays invisible even if
    * re-appended before that compaction; re-add by appending after it. */
  def deleteFromIndex(spark: org.apache.spark.sql.SparkSession,
      table: String, ids: DataFrame): Unit =
    graft.sources.Generations.withMaintenanceLock(table) {
      recoverPendingAppend(spark, table)
      graft.sources.Tombstones.add(spark, table, ids, s"${table}_postings")
      // revertible: the merge landed as a fresh deletes generation; the
      // prior list survives under retention — "undo the takedown" is
      // exactly the asOfCommits=1 probe
      recordSnapshot(spark, table, "delete", revertible = true)
    }

  /** Grow a [[buildIndex]] index with a batch of NEW documents — the
    * index-maintenance half of the serving shape (a daily ingest appends
    * its batch instead of rebuilding the accumulated corpus). After the
    * append the index is statistically IDENTICAL to a full rebuild over
    * old∪new (`Bm25IndexSpec` pins the ranking): postings/dl are
    * per-document facts (append-only), df merges additively per term,
    * and N/Σdl are additive counters.
    *
    * Costs scale with the BATCH, not the index: one posting aggregation
    * over the new docs (appended into the same tb directory layout,
    * term-sorted within the new files — row-group stats still prune),
    * one vocabulary-sized df merge (the dfs table is rewritten:
    * term-cardinality rows, orders of magnitude below the postings),
    * and a 1-row bounds rewrite.
    *
    * Doc ids must be NEW — re-appending an already-indexed document
    * would split its (term, doc) tf across two posting rows and
    * double-count its score contribution (the same everything-ingested
    * contract as the MinHash ingest loop, where duplicate ids are
    * instead benign).
    *
    * Failure semantics: the batch's posting files are STAGED beside the
    * index and move into the live generation only AFTER the dfs CAS
    * commits, so a LOST RACE (a cross-JVM writer committing dfs first
    * throws [[graft.sources.ConcurrentMaintenanceException]]) leaves
    * the index unchanged — the staging is deleted and re-running the
    * append is safe (wrap in
    * [[graft.sources.Generations.retryOnConcurrentMaintenance]]). A
    * lost bounds CAS self-heals: both contributions are additive, so
    * the op re-reads the moved bounds and re-adds its batch (UNBOUNDED
    * retry — each lost round means another writer committed, so it
    * always converges; exhausting a bounded retry here would let
    * ConcurrentMaintenanceException escape AFTER the postings moved in,
    * and the documented wrapper would replay the whole append,
    * duplicating postings). A CRASH after the dfs commit — mid-move,
    * mid-bounds, anywhere — is rolled FORWARD by
    * [[recoverPendingAppend]] (r15 directive 4): the batch's full
    * intent (staged file list + bounds delta) was persisted in a
    * pending sidecar before the commit, renames are idempotent and the
    * bounds delta is exactly-once via a generation tag, so the next
    * maintenance op (or an explicit recover call) COMPLETES the append
    * instead of the old rebuild-from-snapshot prescription; a crash
    * before the commit rolls back to an untouched index. A probe
    * running DURING an append may observe the df merge before the
    * batch's postings land — the documented transient staleness,
    * resolved at the move + bounds commit (or the recovery). The df merge
    * and bounds update themselves land as fresh GENERATIONS flipped
    * atomically (the [[graft.sources.Generations]] contract), so a
    * concurrent probe always reads a COMPLETE dfs/bounds table — stale
    * at worst, never partial (the previous in-place rewrite could serve
    * an empty or half-written dfs set mid-overwrite, silently dropping
    * terms from concurrent rankings). */
  /** @param autoCompactAfter when > 0, the append finishes by checking
    *   the snapshot log's adds-since-base count for the postings member
    *   (each append adds ~one file per touched tb directory, so the
    *   count IS the probe's files-per-directory growth — measured from
    *   the log alone, no FS walk) and triggers [[compactIndex]] once it
    *   reaches the threshold (r15 directive 6: the 10M-vector smoke
    *   measured grown probes at 3× the fresh band after 5 appends; the
    *   fix existed but had to be remembered). 0 disables — the right
    *   default for histories that must stay time-travelable at fixed
    *   depths (a compaction is one more commit, and retention retires
    *   deeper generations). */
  def appendToIndex(docs: DataFrame, idCol: String, textCol: String,
      table: String, autoCompactAfter: Int = 0): Unit =
    graft.sources.Generations.withMaintenanceLock(table) {
    val spark = docs.sparkSession
    import spark.implicits._
    import graft.sources.Generations
    // a previous append may have died between its dfs commit and its
    // staged-file move — roll it forward (or a pre-commit death back)
    // before building on the index state (r15 directive 4)
    recoverPendingAppend(spark, table)
    val pGen = Generations.ensureGen(spark, s"${table}_postings")
    val dGen = Generations.ensureGen(spark, s"${table}_dfs")
    val bGen = Generations.ensureGen(spark, s"${table}_bounds")
    // format check: a dfs table persisted by a pre-WAND build lacks the
    // (max_tf, min_dl) stats this merge must carry forward — fail loudly
    // with the recovery path instead of an AnalysisException mid-plan
    val dfsCols = spark.table(dGen).columns.toSet
    require(Set("max_tf", "min_dl").subsetOf(dfsCols),
      s"index ${table}_dfs predates the WAND-stats format (missing " +
        "max_tf/min_dl columns) — rebuild the index with buildIndex " +
        "before appending; probes still work via the exact-scan fallback")
    val bounds = spark.table(bGen).collect()
    require(bounds.length == 1, s"index ${table}_bounds must hold exactly 1 row")
    // n/sumdl are re-read at the bounds commit below (additive CAS retry);
    // only the immutable directory fanout is needed up front
    val nDirs = bounds(0).getLong(2)

    // postings are STAGED, not appended directly: the batch's posting
    // files land in a sibling staging directory first (same tb layout,
    // term-sorted within files), and only move into the live generation
    // AFTER the dfs CAS below commits. A cross-JVM racer winning the
    // dfs CAS therefore leaves the index UNCHANGED by this op — the
    // staging is deleted and the op is cleanly retryable (r14 ADVICE:
    // the previous append-first order left postings in with no df
    // contributions on a lost race, and a re-run duplicated them). The
    // remaining crash window is the rename pass between the dfs commit
    // and the move — N file renames, microseconds against the write —
    // documented below.
    val pDest = new org.apache.hadoop.fs.Path(
      Generations.location(spark, pGen))
    val fs = pDest.getFileSystem(spark.sessionState.newHadoopConf())
    val batchId = java.util.UUID.randomUUID().toString.take(8)
    val stageP = new org.apache.hadoop.fs.Path(
      Generations.basePath(spark, s"${table}_postings") +
        "__stage" + batchId)
    postingsOf(docs, idCol, textCol, nDirs.toInt)
      .repartition($"tb")
      .sortWithinPartitions($"tb", $"term")
      .write.format("parquet").mode("overwrite").partitionBy("tb")
      .save(stageP.toString)
    val stagedFiles: Seq[String] = listStagedFiles(fs, stageP)
    // the staged write is the phase that scales with the batch — renew
    // the cross-JVM lease before entering the commit window (r16
    // ADVICE: an append outrunning the TTL could have its stage rolled
    // back under it by another JVM's recovery)
    Generations.renewLease(table)
    val b = boundsOf(docs, idCol, textCol).collect()(0)
    // PENDING MANIFEST (r15 directive 4 — closing the last
    // non-retryable crash window): before the dfs merge commits, the
    // batch's full intent — staged file list + additive bounds delta —
    // lands in a sidecar beside the index, and the new dfs generation
    // is tagged with the batch id. A crash ANYWHERE after the dfs
    // commit is then rolled FORWARD by recoverPendingAppend (renames
    // idempotent, bounds exactly-once via the generation tag, snapshot
    // rows re-recorded); a crash BEFORE it rolls back (stage + sidecar
    // deleted, index untouched). The previous contract documented this
    // window honestly and prescribed a rebuild — now it self-heals.
    writePending(spark, table, batchId, stageP.toString,
      b.getLong(0), b.getLong(1), stagedFiles)
    fireHook(() => testAfterPendingHook, testAfterPendingHook = _)
    // df merge: vocabulary-sized, written as a FRESH generation and
    // flipped atomically — a probe in another session during the merge
    // reads the complete previous generation, never a partial one. df
    // adds, max_tf/min_dl merge by max/min — the probe's per-term score
    // bound stays valid over any append sequence.
    val nextD = Generations.reserve(spark, s"${table}_dfs")
    try {
      writeDirs(
        spark.table(dGen)
          .unionByName(postingsOf(docs, idCol, textCol, nDirs.toInt)
            .groupBy($"tb", $"term").agg(count(lit(1)).as("df"),
              max($"tf").as("max_tf"), min($"dl").as("min_dl")))
          .groupBy($"tb", $"term").agg(sum($"df").as("df"),
            max($"max_tf").as("max_tf"), min($"min_dl").as("min_dl")),
        nextD,
        Generations.genPath(
          Generations.basePath(spark, s"${table}_dfs"), nextD))
      // the batch tag is what recovery keys on: current dfs gen tagged
      // with this batch ⇒ the merge committed ⇒ roll forward
      spark.sql(s"ALTER TABLE $nextD SET TBLPROPERTIES " +
        s"('$batchProp' = '$batchId')")
      // SIDECAR RE-CHECK before the point of no return (r16 ADVICE): if
      // this op outran its lease TTL, another JVM's recovery may have
      // rolled the batch BACK — sidecar and stage deleted. Committing
      // the dfs merge now would record df contributions whose postings
      // are gone (silent df-vs-postings divergence); abort loudly
      // instead — the index is untouched, re-run the batch. (The
      // check-to-commit window is microseconds against the TTL; the
      // recovery's decision is stable once the sidecar is gone.)
      if (!fs.exists(pendingPath(spark, table, batchId)))
        throw new IllegalStateException(
          s"bm25 append $batchId on $table: the pending sidecar vanished " +
            "before the df commit — this op outran its maintenance lease " +
            "TTL and another JVM's recovery rolled the batch back. The " +
            "index is unchanged; re-run the batch (and raise " +
            "spark.graft.lease.ttlSeconds or keep renewLease checkpoints " +
            "for batches this large)")
      // CAS on the generation the merge READ (dGen): a concurrent
      // append's committed df contributions must never be silently
      // discarded. Losing here deletes the staging — index unchanged,
      // op retryable (retryOnConcurrentMaintenance-safe).
      Generations.commit(spark, s"${table}_dfs", nextD, Some(dGen))
    } catch {
      case e: Throwable =>
        fs.delete(stageP, true)
        deletePending(spark, table, batchId)
        throw e
    }
    crashPoint("bm25.append.afterDfsCommit")
    fireHook(() => testAfterDfsCommitHook, testAfterDfsCommitHook = _)
    // the dfs flip committed — past here the batch WILL land. If the
    // sidecar is gone NOW, another JVM's recovery saw the committed tag
    // and rolled the batch FORWARD to completion (moves, bounds,
    // snapshot — it deletes the sidecar LAST): everything this op still
    // had to do is done; finish as a success instead of double-applying
    // (r16 ADVICE — the lease-TTL-outrun window, closed end to end)
    if (!fs.exists(pendingPath(spark, table, batchId))) {
      logger.warn(s"bm25 append $batchId on $table: completed by another " +
        "JVM's recovery after this op outran its lease TTL — the batch " +
        "is fully applied (postings, bounds, snapshot); nothing left to do")
      return
    }
    // move the staged posting files into the live generation's tb
    // directories (pure renames; file names carry the write job's UUID,
    // so they never collide with resident files). The moved names are
    // the commit's add-file delta for the snapshot log (r16) — zero
    // directory walks per append commit.
    moveStagedIn(fs, stageP, pDest, stagedFiles)
    fs.delete(stageP, true)
    // register any NEW partition directories this batch introduced in
    // the shared external catalog (the probe-side refreshTables note
    // below covers stale file listings in OTHER sessions)
    spark.sql(s"ALTER TABLE $pGen RECOVER PARTITIONS")
    spark.catalog.refreshTable(pGen)
    crashPoint("bm25.append.afterMove")
    // bounds: additive counters, 1 driver row — exactly-once via the
    // batch tag (re-checked every CAS round, so a concurrent recovery's
    // application is never doubled), unbounded CAS retry
    addBoundsTagged(spark, table, b.getLong(0), b.getLong(1), batchId)
    // a recovery may have finished the record half while this op was
    // moving/adding (both directions are idempotent; the narrow
    // double-record window leaves one extra dedup-folded commit row) —
    // skip the duplicate when the sidecar is already gone
    if (!fs.exists(pendingPath(spark, table, batchId))) {
      logger.warn(s"bm25 append $batchId on $table: snapshot already " +
        "recorded by a concurrent recovery — skipping the duplicate")
      return
    }
    // NOT revertible (directory readers cannot un-see the appended
    // files); the moved file names become the commit's add-file delta,
    // which is exactly what lets resolveStateAsOf serve history ACROSS
    // this commit
    recordSnapshot(spark, table, "append", revertible = false,
      addedFiles = Map(s"${table}_postings" -> stagedFiles))
    deletePending(spark, table, batchId)
    // auto-compaction cadence: reentrant under the family lock
    if (autoCompactAfter > 0 && graft.sources.Snapshots.addsSinceBase(
        spark, table, s"${table}_postings") >= autoCompactAfter) {
      logger.info(s"bm25 $table: $autoCompactAfter appends since the last " +
        "base manifest — auto-compacting")
      compactIndex(spark, table)
    }
  }

  /** Compact an index after [[appendToIndex]] batches — the THIRD
    * maintenance primitive (build → append → compact, the Lucene
    * segment-merge / Delta OPTIMIZE shape). Every append adds its own
    * term-sorted file per touched tb directory, so after N batches a
    * probe of a directory reads N files and in-file term sorting (the
    * row-group prune) holds only per batch. Compaction rewrites each
    * table as ONE fresh generation — term-sorted across everything in
    * the directory — then swaps the table to it and deletes the old
    * generation (write-new / swap / delete-old: never an in-place
    * overwrite of files a plan is reading; transient 2× disk on the
    * rewritten table is how segment merges pay for themselves, and the
    * swap is metadata-only).
    *
    * Pure layout maintenance: rows are untouched, so ranking equality
    * with the uncompacted index IS the correctness check (q161 shares
    * q152/q155/q159's oracle verbatim; `Bm25IndexSpec` additionally
    * pins one file per directory afterwards).
    *
    * Crash safety and concurrent readers (the [[graft.sources
    * .Generations]] contract): each table's new generation is FULLY
    * written and registered before the live view flips onto it — ONE
    * atomic catalog op, so a probe resolving the live name at any
    * instant sees a complete generation, never a missing or
    * half-swapped table. A failure mid-rewrite leaves the live index
    * intact; re-running the compaction overwrites the partial
    * generation idempotently. The two tables flip one after the other;
    * a crash between them leaves a half-compacted LAYOUT (both tables
    * internally complete — re-run to finish). The superseded generation
    * is RETAINED until the next maintenance commit, so even a probe
    * frame PLANNED before the compaction still collects; only plans
    * held across two maintenance cycles lose their files
    * (`GenerationsSpec` pins both properties). */
  def compactIndex(spark: org.apache.spark.sql.SparkSession,
      table: String): Unit =
    graft.sources.Generations.withMaintenanceLock(table) {
    import spark.implicits._
    import graft.sources.{Generations, Tombstones}
    // finish (or discard) any append that died mid-commit before the
    // rewrite reads the directories it left behind; audit unrecorded
    // files loudly before the fresh base manifest folds them back into
    // served history (r16 directive 6)
    recoverPendingAppend(spark, table)
    graft.sources.Snapshots.auditUnrecorded(spark, table,
      Seq(s"${table}_postings"))
    def swap(live: String, cols: Seq[Column],
        fold: DataFrame => DataFrame = identity): Unit = {
      val gen = Generations.ensureGen(spark, live)
      val old = Generations.location(spark, gen)
      val nextGen = Generations.reserve(spark, live)
      // read by PATH, not by name: the live view keeps serving the old
      // generation until the commit below, and the rewrite must not
      // depend on the registration it supersedes (partition discovery
      // types tb as int — cast back to the build schema so compaction
      // never drifts the contract). writeDirs overwrites the reserve
      // placeholder in place — the claim is never released.
      writeDirs(fold(spark.read.parquet(old).select(cols: _*)), nextGen,
        Generations.genPath(old.replaceAll("__g\\d+$", ""), nextGen))
      // CAS on the generation the rewrite read: losing a race here would
      // silently resurrect rows a concurrent maintenance op removed
      Generations.commit(spark, live, nextGen, Some(gen))
    }
    require(spark.table(s"${table}_dfs").columns
        .toSet.intersect(Set("max_tf", "min_dl")).size == 2,
      s"index ${table}_dfs predates the WAND-stats format (missing " +
        "max_tf/min_dl columns) — rebuild the index with buildIndex " +
        "before compacting; probes still work via the exact-scan fallback")
    // fold tombstones into the postings rewrite (their rows drop
    // physically); the dfs/bounds statistics are deliberately NOT
    // adjusted — deleteFromIndex's semantics freeze them at the
    // historical corpus, which is what keeps rankings invariant across
    // this fold (q170 compacts mid-query and stays on its oracle)
    val tomb = Tombstones.frame(spark, table)
    swap(s"${table}_postings", Seq($"tb".cast("long").as("tb"),
        $"term", $"doc_id", $"tf", $"dl"),
      df => Tombstones.filterWith(df, "doc_id", tomb, table))
    swap(s"${table}_dfs", Seq($"tb".cast("long").as("tb"), $"term", $"df",
      $"max_tf", $"min_dl"))
    // reset AFTER the fold's flip: a crash in between leaves tombstones
    // for rows that no longer exist — the anti-join is then a no-op and
    // the next compaction clears the residue
    if (tomb.nonEmpty) Tombstones.clear(spark, table)
    recordSnapshot(spark, table, "compact", revertible = true)
  }

  /** [[topK]] against a PERSISTED index from [[buildIndex]] — identical
    * ranking at `maxDf = Long.MaxValue` (same postings, same df, same
    * bounds, same scoring tree; `Bm25IndexSpec` pins it row-for-row),
    * with per-call cost bounded by the query terms' posting lists
    * instead of the corpus: the batch's distinct terms are a bounded
    * driver model (a retrieval batch, like the operator's query
    * contract) pushed into the posting scan as a term-IN filter —
    * parquet row-group pruning + bucket pruning read only matching
    * buckets.
    *
    * `maxDf` is the common-term bound: a stopword-frequency query term
    * legitimately drags a corpus-sized posting list into the score
    * aggregation (measured: zipf-common terms dominate the batch-shape
    * smoke). Terms with df > maxDf are EXCLUDED FROM SCORING — a LOSSY,
    * loudly-logged prune (the standard stopword cut; BM25 weights such
    * terms near ln(1+~1) ≈ the noise floor, but a top-k reshuffle at the
    * margin is possible). The df check costs one scan of the
    * term-pruned dfs table — never the postings. Default ∞ = exact. */
  /** Spark's `xxhash64(string, seed=42)` evaluated locally — the same
    * Catalyst expression the index write compiled, so the driver-side
    * directory keys match the on-disk `tb` values exactly. */
  private def xxh64Local(s: String): Long = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    import org.apache.spark.unsafe.types.UTF8String
    XxHash64(Seq(Literal(UTF8String.fromString(s),
        org.apache.spark.sql.types.StringType)), 42L)
      .eval(InternalRow.empty).asInstanceOf[Long]
  }

  /** @param prune lossless WAND/maxscore top-k bound (default ON; the
    *   round-12 finding: the EXACT index probe on zipf-common workloads
    *   paid the full corpus-scale (qid, doc) aggregation + sort the
    *   batch shape pays, 1568 s vs 698 s @100M). Two extra bounded
    *   passes make the common-term case cheap WITHOUT losing a row:
    *    1. FLOOR — each query's `floorTermsPerQuery` rarest kept terms
    *       give exact PARTIAL scores (a subset of a doc's matched terms
    *       ⇒ a lower bound on its total), so the k-th best partial per
    *       query is a valid floor θ on its k-th best total score;
    *    2. BOUND — every (qid, doc) group's matched-term upper-bound
    *       sum Σ ub(t) (ub evaluated at the stored (max_tf, min_dl) —
    *       tfPart is monotone in both, and every IEEE op in the tree is
    *       monotone, so ub ≥ every contribution the term can emit)
    *       rides the score aggregation as a second sum; groups with
    *       Σ ub < θ score strictly below k docs and are dropped BEFORE
    *       the top-k sort. Docs at θ survive (≥, not >), so ties break
    *       exactly as the exact path does. Queries with < k floor rows
    *       get θ = -∞ (no pruning) — degenerate cases stay exact.
    *   `prune = false` keeps the straight scan-score-sort path (q166
    *   pins it against the same oracle as the pruned default). */
  /** @param pruneMinPostings the WAND floor pass is itself two bounded
    *   Spark jobs; below this many matching postings (Σ df of the kept
    *   terms — known driver-side for free) the straight scan wins, so
    *   the probe falls back to it. Purely a cost switch between two
    *   paths that rank identically (q155/q166 share one oracle).
    * @param pruneMinMaxDf the second gate condition, measured by the r14
    *   sweep (tools/smokelogs/r14_bm25gates_*.log): WAND exists to
    *   starve the aggregation/sort of a SINGLE corpus-scale posting
    *   list's fanout, so its benefit tracks the LARGEST kept df, not the
    *   Σ — a 300-term rare workload at 10M docs clears a Σ-only gate
    *   (4.7M matching) yet the straight scan wins 3.1 s vs 4.6 s (the
    *   floor passes prune almost nothing: essential coverage 72%).
    *   Measured brackets: max df ~500k (1M zipf) → WAND a wash (6.7 vs
    *   6.6 s); ~5M (10M zipf) → WAND wins 45.9 vs 52.3 s (27.0 s with
    *   the semi-join); ~20k (10M rare) → straight wins; ~159k (100M
    *   rare, 47.7M matching — a workload the Σ-only gate mis-sent to
    *   WAND) → straight median ~48 s vs WAND ~62 s vs semi ~79 s. Both
    *   gates are exact driver-side numbers, never estimates; all four
    *   paths are checksum-equal at every decade.
    * @param semiJoinMinPrunable measured brackets (same sweep): prunable
    *   154.7M @10M zipf → engage wins 27–32 s vs 45.9 s wand-only;
    *   prunable 14.6M @1M zipf → a wash (6.1 vs 6.7 s, inside noise) —
    *   the 50M default sits between the no-gain and big-gain decades. */
  /** @param candidateFilter optional metadata predicate over the
    *   posting columns (doc_id, tf, dl): non-qualifying documents leave
    *   every CANDIDATE set — the filter rides the same spot as the
    *   tombstone anti-join, so scoring statistics stay index-wide (the
    *   deleteFromIndex / q173 "candidates only" semantics) and the WAND
    *   machinery keeps its losslessness argument verbatim (ub bounds a
    *   superset; θ comes from surviving candidates' achieved scores).
    *   The filtered-RAG serving shape: "top-k over docs matching this
    *   tenant/language/date predicate". */
  def topKAgainstIndex(queries: DataFrame, table: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      maxDf: Long = Long.MaxValue,
      prune: Boolean = true, floorTermsPerQuery: Int = 2,
      pruneMinPostings: Long = 2000000L,
      pruneMinMaxDf: Long = 1000000L,
      semiJoinMinPrunable: Long = 50000000L,
      maxBatchPairs: Long = 8000000L,
      asOfCommits: Int = 0,
      candidateFilter: Option[Column] = None,
      asOfTimestamp: Long = 0L,
      asOfTag: String = "",
      spreadMinFanout: Long = 1000000L): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    require(floorTermsPerQuery >= 1,
      s"need floorTermsPerQuery >= 1, got $floorTermsPerQuery")
    val spark = queries.sparkSession
    // drop any cached file listing THIS session holds for the index
    // tables: maintenance may have run in ANOTHER session (a foreachBatch
    // micro-batch clone — q167's stream), whose appends refresh only its
    // own caches; a stale listing here silently serves pre-append files
    // (caught by q167's oracle). Cost: the next read re-lists, which
    // planning pays anyway.
    graft.sources.Generations.refreshTables(spark,
      s"${table}_postings", s"${table}_dfs", s"${table}_bounds")
    // TIME TRAVEL: resolve every member to a historical state from the
    // family snapshot log ([[graft.sources.Snapshots]]) — the
    // operational rollback read ("a bad takedown/compaction landed;
    // serve yesterday's index while we fix it"). Addressable three
    // ways (at most one): `asOfCommits` (fixed depth), `asOfTimestamp`
    // (epoch millis — "yesterday's index by yesterday's clock", stable
    // under any auto-compaction cadence, r17 directive 4), or
    // `asOfTag` (a name minted by Snapshots.tagSnapshot). The postings
    // member is file-tracked: its historical read lists the commit's
    // FILE MANIFEST instead of the directory, so the probe crosses
    // append commits exactly (files appended later are unseen). The
    // rest of the probe is IDENTICAL: same dir pruning, same WAND
    // bounds, same scoring tree, just over the historical members; a
    // retired generation is named loudly on first read, never
    // partially served.
    val timeTravel = asOfCommits != 0 || asOfTimestamp != 0L ||
      (asOfTag != null && asOfTag.nonEmpty)
    // the snapshot resolve (manifest + file-log collects) and the query
    // batch's cap-check take are INDEPENDENT bounded driver jobs —
    // overlap them (the guide's concurrent-jobs pattern, r18): a
    // time-travel probe's construction latency is its sequential job
    // count, and these were its two longest serial spans. Resolution
    // errors surface at the Await below, before any member is read.
    val resolvedF: scala.concurrent.Future[
        Map[String, graft.sources.Snapshots.MemberState]] =
      if (!timeTravel) scala.concurrent.Future.successful(Map.empty)
      else scala.concurrent.Future(graft.sources.Snapshots.resolveSelector(
        spark, table, asOfCommits, asOfTimestamp, asOfTag))(
        scala.concurrent.ExecutionContext.global)
    lazy val resolved: Map[String, graft.sources.Snapshots.MemberState] =
      scala.concurrent.Await.result(resolvedF,
        scala.concurrent.duration.Duration.Inf)
    def member(live: String): DataFrame =
      resolved.get(live).map(_.read(spark)).getOrElse(spark.table(live))
    // lazy val, not def: a historical member read builds a fresh file
    // index (re-listing the manifest's files) per call, and the probe
    // reads the postings/dfs frames more than once (r18)
    lazy val pTbl = member(s"${table}_postings")
    lazy val dTbl = member(s"${table}_dfs")
    lazy val bTbl = member(s"${table}_bounds")
    import spark.implicits._
    val qProjected =
      queries.select(col("qid").cast("long").as("qid"), col("term"))
    // ONE bounded take replaces the count()+collect() job pair (r14
    // verdict directive: a probe must not plan a Spark job whose only
    // purpose is the cap check). take() stops at cap+1 rows, so even an
    // abusive corpus-sized batch costs the driver one legal batch.
    // Runs BEFORE anything that awaits the snapshot resolve, so the two
    // serial job spans overlap (r18).
    val capProbe = (math.min(maxBatchPairs, Int.MaxValue - 2L) + 1L).toInt
    val qPairsRaw = qProjected.take(capProbe)
    // a dfs table persisted by a pre-WAND build lacks (max_tf, min_dl):
    // probes stay SERVABLE via the exact path (no bounds to evaluate —
    // the prune is a cost optimization, never a semantic one), loudly
    // logged; append/compact refuse with a rebuild message instead
    val hasWandStats = dTbl.columns
      .toSet.intersect(Set("max_tf", "min_dl")).size == 2
    if (!hasWandStats)
      logger.warn(s"bm25 topKAgainstIndex: index ${table}_dfs predates the " +
        "WAND-stats format (missing max_tf/min_dl) — running the exact " +
        "scan-score-sort path (identical ranking, no top-k prune); " +
        "rebuild the index with buildIndex to re-enable WAND")
    // the loud batch cap (the Dedup.incrementalAssembled pattern): the
    // qPairs collect above is bounded only by the one-retrieval-batch
    // contract — a caller handing a corpus-sized "batch" used to get a
    // driver OOM. Over the cap, fall back to the fully-distributed batch
    // shape against the index's tables: no driver collect, no dir
    // pruning, no WAND — identical rows (maxDf included: the dfs inner
    // join drops over-frequent terms), corpus-scale cost, loudly logged.
    // tombstones (deleteFromIndex): fetched ONCE per probe; every
    // posting frame below anti-joins it, so deleted docs are out of all
    // rankings immediately. Scoring statistics stay historical (the
    // Lucene trade — see deleteFromIndex), so the WAND machinery is
    // untouched: ub bounds a SUPERSET of the surviving postings (still
    // an upper bound) and θ comes from achieved scores of SURVIVORS
    // (still a valid floor) — losslessness holds with deletes in play.
    val tomb =
      if (!timeTravel) graft.sources.Tombstones.frame(spark, table)
      else resolved.get(s"${table}_deletes")
        .flatMap(g => graft.sources.Tombstones.frameAt(spark, g.gen))
    def minusDeleted(df: DataFrame): DataFrame = {
      val alive = graft.sources.Tombstones.filterWith(df, "doc_id", tomb, table)
      // candidateFilter rides the same spot: candidates only, statistics
      // index-wide (see the param doc) — every posting read below goes
      // through here, so both probe paths and the over-cap fallback
      // filter identically
      candidateFilter.fold(alive)(alive.filter)
    }
    if (qPairsRaw.length >= capProbe) {
      logger.warn(s"bm25 topKAgainstIndex: query batch has > " +
        s"$maxBatchPairs (qid, term) pairs (maxBatchPairs) — falling " +
        "back to the distributed full-scan path (no dir pruning, no WAND; " +
        "identical rows). Split the workload into bounded retrieval " +
        "batches to get the serving-shape plan back.")
      val qStaged = Stage.cut(qProjected)
      val dfsAll = dTbl
        .select($"term", $"df").filter($"df" <= maxDf)
      val postingsAll = minusDeleted(pTbl
        .select($"term", $"doc_id", $"tf", $"dl"))
      val totals = bTbl.select($"n", $"sumdl")
      return scoreAndRank(qStaged, postingsAll, dfsAll, totals, k, k1, b,
        broadcastQueries = false)
    }
    // bounded driver model: ONE retrieval batch (the same contract that
    // lets topK broadcast the query frame); its pairs — already
    // materialized by the cap-check take above — drive the floor term
    // selection, its distinct terms the dir pruning. The batch rows are
    // ON the driver already, so the staged query frame is a
    // LocalRelation (same rows, nulls preserved via the original
    // schema): every downstream read is a driver-local scan and every
    // broadcast of it builds WITHOUT a Spark job — a serving probe's
    // latency is its sequential small-job count, and the checkpointed
    // distributed frame this replaces cost one materialization job plus
    // one broadcast-build job per consumer (r17 measurement: ~half of
    // an index probe's wall time was these driver round-trips).
    val qStaged = spark.createDataFrame(
      java.util.Arrays.asList(qPairsRaw: _*), qProjected.schema)
    val qPairs = qPairsRaw.map(r => (r.getLong(0), r.getString(1)))
    val qTerms = qPairs.map(_._2).distinct
    val boundsRow = bTbl.collect()
    require(boundsRow.length == 1,
      s"index ${table}_bounds must hold exactly 1 row")
    val (n, sumdl, nDirs) = (boundsRow(0).getLong(0),
      boundsRow(0).getLong(1), boundsRow(0).getLong(2))
    def tbOf(terms: Seq[String]): Seq[Long] =
      terms.map(t => Math.floorMod(xxh64Local(t), nDirs)).distinct
    // per-term stats ride a dir-pruned term-IN scan of the dfs table —
    // bounded output, collected to drive the maxDf prune, the WAND
    // bounds AND the scoring join's broadcast (no second dfs scan).
    // Pre-WAND indexes carry no (max_tf, min_dl) — sentinel values are
    // fine: the exact path below never reads them.
    val dfsScan = dTbl
      .filter($"tb".isin(tbOf(qTerms.toSeq): _*) &&
        $"term".isin(qTerms.toSeq: _*))
    val termStats = (if (hasWandStats)
        dfsScan.select($"term", $"df", $"max_tf", $"min_dl")
      else dfsScan.select($"term", $"df", lit(0L).as("max_tf"),
        lit(0L).as("min_dl")))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val kept = termStats.filter(_._2 <= maxDf)
    if (kept.length < termStats.length)
      logger.warn(s"bm25 topKAgainstIndex: dropping " +
        s"${termStats.length - kept.length} of ${termStats.length} query terms " +
        s"with df > $maxDf — scores exclude these common terms (lossy " +
        "stopword prune; raise maxDf for exact ranking)")
    def dirPrunedPostings(terms: Seq[String], spread: Boolean = true): DataFrame =
      // dir pruning happens at PLANNING (tb is the partition column —
      // only the directories the terms hash into are listed/read); the
      // term-IN narrows to exact postings inside each file, helped by
      // the in-file term sort's row-group stats. The repartition then
      // SPREADS each term's single-directory concentration before the
      // scoring join: without it, one scan task absorbs a zipf-common
      // term's whole join fanout and its partial aggregation runs the
      // stage single-threaded (measured 3.5x on the agg at 10M)
      {
        val scan = minusDeleted(pTbl
          .filter($"tb".isin(tbOf(terms): _*) && $"term".isin(terms: _*))
          .select($"term", $"doc_id", $"tf", $"dl"))
        // the spread matters only where the consumer fans out map-side
        // (the scoring join); the floor/candidate consumers flow into
        // their own hash exchange immediately — spreading them first
        // would just add an exchange
        if (spread) scan.repartition(spark.sessionState.conf.numShufflePartitions)
        else scan
      }
    val keptTerms = kept.map(_._1).toSeq
    val matchingPostings = kept.map(_._2).sum
    // the zipf-term spread's exchange only pays for itself when the
    // scoring join's fanout is worth parallelizing (one scan task can
    // absorb a common term's whole fanout — measured 3.5x on the
    // aggregation at the 10M decade; conversely at small volumes the
    // extra exchange plus its one-task-per-core stage IS the probe's
    // cost). The fanout is exact driver-side arithmetic:
    // Σ_t df(t) · |qids sharing t| — never an estimate.
    val nqByTerm = qPairs.groupBy(_._2).map { case (t, ps) =>
      (t, ps.map(_._1).distinct.length.toLong) }
    val fanout = kept.iterator
      .map(s => s._2 * nqByTerm.getOrElse(s._1, 0L)).sum
    val postings = dirPrunedPostings(keptTerms,
      spread = fanout >= spreadMinFanout)
    val maxTermDf = if (kept.isEmpty) 0L else kept.map(_._2).max
    // (n, sumdl) were just collected from the bounds member — stage the
    // 1-row totals frame locally so its broadcast builds without a job
    val totalsLocal = spark.createDataFrame(Seq((n, sumdl))).toDF("n", "sumdl")
    if (!prune || !hasWandStats || matchingPostings < pruneMinPostings ||
        maxTermDf < pruneMinMaxDf) {
      logger.info(s"bm25 topKAgainstIndex: straight scan-score-sort path " +
        s"($matchingPostings matching postings, max term df $maxTermDf; " +
        (if (!prune) "prune=false"
         else if (!hasWandStats) "pre-WAND dfs format"
         else if (matchingPostings < pruneMinPostings)
           s"below pruneMinPostings=$pruneMinPostings"
         else s"max df below pruneMinMaxDf=$pruneMinMaxDf") + ")")
      val dfs = spark.createDataFrame(kept.toSeq
          .map { case (t, df, _, _) => (t, df) }).toDF("term", "df")
      return scoreAndRank(qStaged, postings, dfs, totalsLocal, k, k1, b)
    }
    // floor lists ride their own dir-pruned scan (fewer directories
    // than the full kept set); per-term ub evaluated driver-side inside
    // the shared tail — every op in the tree is IEEE-monotone, so
    // ub_e4 >= c_e4 for every posting of the term
    logger.info(s"bm25 topKAgainstIndex: WAND-bounded path " +
      s"($matchingPostings matching postings >= " +
      s"pruneMinPostings=$pruneMinPostings, max term df $maxTermDf >= " +
      s"pruneMinMaxDf=$pruneMinMaxDf)")
    wandScoreAndRank(qStaged, qPairs, kept, n, sumdl, postings,
      dirPrunedPostings(_, spread = false), k, k1, b, floorTermsPerQuery,
      semiJoinMinPrunable)
  }
}
