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

  /** Train a merge table on `df`: md5 hash-sample to ≤ `sampleCap` docs,
    * one distributed word-count pass over the sample, keep the
    * `maxWords` most frequent words (count DESC, word ASC — a bounded
    * TakeOrdered collect), learn `numMerges` merges driver-side. */
  def train(df: DataFrame, idCol: String, textCol: String,
      numMerges: Int = 256, sampleCap: Int = 2000, maxWords: Int = 20000)
      : Array[(String, String)] = {
    require(sampleCap >= 1 && maxWords >= 1,
      "sampleCap and maxWords must be >= 1")
    val n = df.count()
    val sample =
      if (n <= sampleCap) df
      else Sampling.hashSample(df, idCol, sampleCap.toDouble / n)
    val counts = sample
      .select(explode(CorpusFilters.words(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), asc("w")).limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    learnMerges(counts, numMerges)
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
}
