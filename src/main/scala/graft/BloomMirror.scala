package graft

import org.apache.spark.util.sketch.BloomFilter

/** Straight-line JVM mirror of q141 (Bloom-filter decontamination) for
  * the SF-scale DuckDB oracle. Exact because a Bloom filter is a pure
  * bitset: distributed partial OR-merges are associative, commutative
  * and idempotent, so a locally-streamed build over the same inputs is
  * BYTE-IDENTICAL to the cluster's merged aggregate (pinned in
  * `BloomDecontSpec`) — the property HLL's order-sensitive HIP estimator
  * lacks, which is why q63/q98 stay rows-only while this sketch query
  * can be fully verified, false positives included.
  *
  * Replays: `deterministicSplit`'s md5-bucket labels, the
  * `graft_tokens`/`graft_ngrams` gram derivation (via the same local
  * Catalyst evals as [[DsirMirror]]), `xxhash64` (seed 42), and the same
  * public `org.apache.spark.util.sketch.BloomFilter` the distributed
  * `bloom_filter_agg` builds.
  */
object BloomMirror {

  private def gramsOf(text: String, n: Int): Array[String] = {
    val ts = DsirMirror.tokensOf(text)
    if (ts.length < n) Array.empty
    else (0 to ts.length - n).map(i => ts.slice(i, i + n).mkString(" ")).toArray
  }

  /** `deterministicSplit(90/5/5)` label for one id. */
  private[graft] def splitOf(id: Long): String = {
    val b = MirrorHash.md5Bucket4(id)
    if (b < MirrorHash.hexThreshold(0.9)) "train"
    else if (b < MirrorHash.hexThreshold(0.9 + 0.05)) "val"
    else "test"
  }

  /** q141 contract: 90/5/5 split, 3-grams, flag train docs whose gram
    * set intersects the test Bloom filter (auto-sized:
    * max(1024, occurrences) items × bitsPerItem bits, capped at
    * `maxBits` AND at the session's runtime bloomFilter confs —
    * `confMaxItems`/`confMaxBits` default to Spark's conf defaults and
    * MUST be the live session values when those confs are overridden,
    * because `bloom_filter_agg` silently Math.min-clamps to them; the
    * one sizing formula lives in `CorpusFilters.bloomSizing`).
    * Input (doc_id, text); output (doc_id, n_grams, n_flagged,
    * contaminated) for every train doc. */
  def recompute(docs: Seq[(Long, String)], n: Int = 3,
      bitsPerItem: Int = 15, maxBits: Long = 1L << 27,
      confMaxItems: Long = 4000000L, confMaxBits: Long = 1L << 26)
      : Seq[(Long, Long, Long, Boolean)] = {
    val train = docs.filter(d => splitOf(d._1) == "train").sortBy(_._1)
    val testGrams = docs.filter(d => splitOf(d._1) == "test")
      .flatMap(d => gramsOf(d._2, n))
    if (testGrams.isEmpty)
      return train.map { case (id, t) =>
        (id, gramsOf(t, n).length.toLong, 0L, false)
      }
    val (items, numBits) = graft.operators.CorpusFilters.bloomSizing(
      testGrams.size.toLong, bitsPerItem, maxBits, confMaxItems, confMaxBits)
    val bf = BloomFilter.create(items, numBits)
    testGrams.foreach(g => bf.putLong(SfOracles.xxh64(g)))
    train.map { case (id, t) =>
      val gs = gramsOf(t, n)
      val flagged = gs.count(g => bf.mightContainLong(SfOracles.xxh64(g)))
      (id, gs.length.toLong, flagged.toLong, flagged > 0)
    }
  }
}
