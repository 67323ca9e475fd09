package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained byte-pair-encoding subword tokenizer (Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword Units")
  * — hand-written because this build is offline-locked (the same
  * precedent as the Snowball stemmer), and the piece a pretraining
  * pipeline genuinely needs: packing by WHITESPACE tokens mis-sizes
  * context windows by 30–50% on web text, so q64's packer gains a
  * BPE-token-count twin (q142).
  *
  * 100 TB shape — the only distributed work is embarrassingly cheap:
  *  - TRAIN is bounded: an md5 hash-sampled `sampleCap`-doc slice (the
  *    `Sampling.hashSample` contract shared with the quality
  *    classifier), ONE word-count shuffle over that slice (map-side
  *    combinable), a `maxWords`-row TakeOrdered collect, then a pure
  *    driver merge-learning loop — the driver-side-Lloyd pattern: no
  *    per-iteration cluster jobs, bit-reproducible.
  *  - ENCODE is map-side only: the learned merge table (≤ a few KB)
  *    rides in the UDF closure like a broadcast dim; each row is scored
  *    with zero shuffles. A bounded per-executor memo caches encoded
  *    words (web text is Zipfian — the cache hit rate is the stopword
  *    mass) without ever growing past `MemoCap` entries.
  *
  * Determinism contract (what makes q142 oracle-able): sample
  * membership is the md5-bucket rule; word counts are exact integers;
  * the `maxWords` vocabulary cut orders by (count DESC, word ASC); the
  * merge loop breaks pair-count ties lexicographically; encoding
  * applies merges strictly in learned-rank order. Every step is a pure
  * function of the corpus — `BpeMirror` replays it straight-line.
  */
object Bpe {

  /** End-of-word marker symbol (a distinct symbol, not appended to the
    * last character), so merges never cross word boundaries and word-
    * final units stay distinct from word-internal ones. */
  val Eow = "</w>"

  /** Encoded-word memo upper bound per executor (entries). Beyond it new
    * words are encoded without caching — output is identical either way. */
  private val MemoCap = 200000

  /** Learn `numMerges` merges from a word-frequency table. Pure driver
    * function — shared with `BpeMirror` because training is DRIVER-side
    * even in the distributed path (what the oracle verifies is the
    * distributed sampling/counting/encode/packing around it).
    * Tie-break: highest pair count, then lexicographically smallest
    * (left, right). Adjacent pair occurrences are counted per position;
    * merges apply left-to-right non-overlapping. */
  def learnMerges(wordCounts: Seq[(String, Long)], numMerges: Int)
      : Array[(String, String)] = {
    require(numMerges >= 0, s"numMerges must be >= 0: $numMerges")
    val words = wordCounts.map { case (w, c) =>
      (mutable.ArrayBuffer.from(w.map(_.toString)) += Eow, c)
    }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var step = 0
    var dry = false
    while (step < numMerges && !dry) {
      val pairCounts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + c)
          j += 1
        }
      }
      if (pairCounts.isEmpty) dry = true
      else {
        val best = pairCounts.keysIterator.reduceLeft { (a, b) =>
          val ca = pairCounts(a); val cb = pairCounts(b)
          if (cb > ca || (cb == ca &&
              (b._1 < a._1 || (b._1 == a._1 && b._2 < a._2)))) b else a
        }
        merges += best
        words.foreach { case (syms, _) => mergePairInPlace(syms, best) }
        step += 1
      }
    }
    merges.toArray
  }

  /** Replace every left-to-right non-overlapping (a,b) adjacency with
    * the fused symbol a+b. */
  private def mergePairInPlace(
      syms: mutable.ArrayBuffer[String], pair: (String, String)): Unit = {
    var j = 0
    while (j < syms.length - 1) {
      if (syms(j) == pair._1 && syms(j + 1) == pair._2) {
        syms.update(j, pair._1 + pair._2)
        syms.remove(j + 1)
      }
      j += 1
    }
  }

  /** Encode one word with a learned rank table: repeatedly merge the
    * lowest-rank adjacent pair present (all its non-overlapping
    * occurrences) until none applies. Returns the subword units
    * (trailing unit carries/absorbs [[Eow]]). */
  def encodeWord(word: String, ranks: Map[(String, String), Int])
      : Array[String] = {
    val syms = mutable.ArrayBuffer.from(word.map(_.toString)) += Eow
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var j = 0
      while (j < syms.length - 1) {
        val r = ranks.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
        if (r < bestRank) bestRank = r
        j += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        val (a, b) = findPairByRank(syms, ranks, bestRank)
        mergePairInPlace(syms, (a, b))
      }
    }
    syms.toArray
  }

  private def findPairByRank(syms: mutable.ArrayBuffer[String],
      ranks: Map[(String, String), Int], rank: Int): (String, String) = {
    var j = 0
    while (j < syms.length - 1) {
      val p = (syms(j), syms(j + 1))
      if (ranks.getOrElse(p, Int.MaxValue) == rank) return p
      j += 1
    }
    throw new IllegalStateException("rank vanished mid-encode") // unreachable
  }

  /** Σ per-word subword counts over pre-tokenized words. Pure modulo the
    * optional memo (which never changes the result). */
  def countTokensOfWords(ws: Iterable[String],
      ranks: Map[(String, String), Int],
      memo: java.util.concurrent.ConcurrentHashMap[String, Integer] = null)
      : Int = {
    var total = 0
    ws.foreach { w =>
      val cached = if (memo == null) null else memo.get(w)
      if (cached != null) total += cached.intValue()
      else {
        val n = encodeWord(w, ranks).length
        if (memo != null && memo.size < MemoCap) memo.put(w, Integer.valueOf(n))
        total += n
      }
    }
    total
  }

  /** BPE token count of a raw text (the `CorpusFilters.words`
    * tokenization contract, evaluated locally) — the mirror-side twin of
    * [[tokenCountCol]]. Null/empty text → 0. */
  def countTokens(text: String, ranks: Map[(String, String), Int]): Int =
    if (text == null) 0
    else countTokensOfWords(graft.DsirMirror.tokensOf(text), ranks)

  /** Train-side word-frequency table of `df`: md5 hash-sample to ≤
    * `sampleCap` docs, one distributed word-count pass over the sample,
    * keep the `maxWords` most frequent words (count DESC, word ASC — a
    * bounded TakeOrdered collect). */
  def trainTable(df: DataFrame, idCol: String, textCol: String,
      sampleCap: Int = 2000, maxWords: Int = 20000): Seq[(String, Long)] = {
    require(sampleCap >= 1 && maxWords >= 1,
      "sampleCap and maxWords must be >= 1")
    val n = df.count()
    val sample =
      if (n <= sampleCap) df
      else Sampling.hashSample(df, idCol, sampleCap.toDouble / n)
    sample
      .select(explode(CorpusFilters.words(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), asc("w")).limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  /** Train a merge table on `df` ([[trainTable]] + driver-side
    * [[learnMerges]]). */
  def train(df: DataFrame, idCol: String, textCol: String,
      numMerges: Int = 256, sampleCap: Int = 2000, maxWords: Int = 20000)
      : Array[(String, String)] =
    learnMerges(trainTable(df, idCol, textCol, sampleCap, maxWords), numMerges)

  /** [[train]] but also returning the stable token-id vocabulary
    * ([[vocabOf]]) — the form a pretraining/RAG pipeline consumes
    * (id arrays, not just counts). */
  def trainWithVocab(df: DataFrame, idCol: String, textCol: String,
      numMerges: Int = 256, sampleCap: Int = 2000, maxWords: Int = 20000)
      : (Array[(String, String)], Array[String]) = {
    val table = trainTable(df, idCol, textCol, sampleCap, maxWords)
    val merges = learnMerges(table, numMerges)
    (merges, vocabOf(table, merges))
  }

  // ------------------------------------------------------- token ids

  /** Id of any subword unit not derivable from the training vocabulary
    * (an unseen character at encode time). */
  val UnkId = 0

  /** Stable token-id vocabulary from a training word-count table and its
    * learned merges: index 0 = `<unk>`, then [[Eow]], then the sorted
    * distinct characters of the training words (every single-character
    * unit an in-vocabulary word can decompose to), then the merge
    * products in learned-rank order (first occurrence wins on the rare
    * duplicate product — e.g. ("ab","c") and ("a","bc") both fusing to
    * "abc"). A pure function of (wordCounts, merges), so the id of every
    * unit is reproducible from the training contract alone. */
  def vocabOf(wordCounts: Seq[(String, Long)],
      merges: Array[(String, String)]): Array[String] = {
    val out = mutable.LinkedHashSet.empty[String]
    out += "<unk>"
    out += Eow
    wordCounts.iterator.flatMap(_._1.map(_.toString))
      .toIndexedSeq.distinct.sorted.foreach(out += _)
    merges.foreach { case (a, b) => out += (a + b) }
    out.toArray
  }

  /** Encode one word to token IDS: [[encodeWord]] units mapped through
    * the vocabulary index; unknown units → [[UnkId]]. */
  def encodeWordIds(word: String, ranks: Map[(String, String), Int],
      vocabIdx: Map[String, Int]): Array[Int] =
    encodeWord(word, ranks).map(u => vocabIdx.getOrElse(u, UnkId))

  /** Map-side BPE token-ID Column: each document's words encoded in
    * order, subword id arrays concatenated — `array<int>` out. Same
    * closure/memo shape as [[tokenCountCol]] (the merge table and vocab
    * index ride the UDF closure like a broadcast dim; the bounded
    * executor-local memo caches per-word id arrays). Null text → empty
    * array. */
  def tokenIdsCol(merges: Array[(String, String)], vocab: Array[String])
      : Column => Column = {
    val ranks = merges.zipWithIndex.toMap
    val idx = vocab.zipWithIndex.toMap
    val memo = new java.util.concurrent.ConcurrentHashMap[String, Array[Int]]()
    val f = udf((ws: Seq[String]) =>
      if (ws == null) Array.empty[Int]
      else {
        val b = Array.newBuilder[Int]
        ws.foreach { w =>
          var ids = memo.get(w)
          if (ids == null) {
            ids = encodeWordIds(w, ranks, idx)
            if (memo.size < MemoCap) memo.put(w, ids)
          }
          b ++= ids
        }
        b.result()
      })
    text => f(CorpusFilters.words(text))
  }

  /** Map-side BPE token count Column: tokenization stays in the
    * codegen'd `graft_tokens` expression; only the per-word BPE merge
    * walk runs in the UDF, with the merge table riding in its closure
    * and a bounded executor-local memo caching repeated words. */
  def tokenCountCol(merges: Array[(String, String)]): Column => Column = {
    val ranks = merges.zipWithIndex.toMap
    val memo = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val f = udf((ws: Seq[String]) =>
      if (ws == null) 0 else countTokensOfWords(ws, ranks, memo))
    text => f(CorpusFilters.words(text))
  }

  /** q142 shape: BPE token counts + token-aware sequence packing.
    * Output: (idCol, n_tokens_bpe, shard, pack) — the q64 packer driven
    * by subword counts instead of whitespace counts. */
  def packByBpe(df: DataFrame, idCol: String, textCol: String,
      merges: Array[(String, String)], ctxLen: Int, nShards: Int)
      : DataFrame = {
    val cnt = tokenCountCol(merges)
    val withCounts = df.select(col(idCol),
      cnt(col(textCol)).cast("long").as("n_tokens_bpe"))
    Packing.greedyPack(withCounts, idCol, "n_tokens_bpe", ctxLen, nShards)
  }

  /** [[packByBpe]] emitting the token-ID ARRAYS alongside the counts —
    * the shard rows a pretraining pipeline actually writes out:
    * (idCol, ids, n_tokens_bpe, shard, pack). One encode pass: the
    * count IS `size(ids)` (each subword unit maps to exactly one id in
    * [[encodeWordIds]]), so no second merge walk runs and the pack
    * assignment is provably identical to [[packByBpe]]'s. */
  def packByBpeWithIds(df: DataFrame, idCol: String, textCol: String,
      merges: Array[(String, String)], vocab: Array[String],
      ctxLen: Int, nShards: Int): DataFrame = {
    val idsC = tokenIdsCol(merges, vocab)
    val withIds = df.select(col(idCol), idsC(col(textCol)).as("ids"))
      .withColumn("n_tokens_bpe", size(col("ids")).cast("long"))
    Packing.greedyPack(withIds, idCol, "n_tokens_bpe", ctxLen, nShards)
  }
}
