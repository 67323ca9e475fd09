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

  /** Spark `pmod(long, long)` — the shard key arithmetic. */
  private def pmodL(h: Long, m: Long): Long = { val r = h % m; if (r < 0) r + m else r }

  /** q141 contract: 90/5/5 split, 3-grams, flag train docs whose gram
    * set intersects the test Bloom filter bank (auto-sized + SHARDED by
    * the exact `CorpusFilters.bloomShardCount`/`bloomSizing` arithmetic:
    * `nShards` cap-sized filters keyed by `pmod(xxhash64(gram),
    * nShards)`, each sized for the uniform ceil-split of the global
    * occurrence count, capped at `maxBits` AND the session's runtime
    * bloomFilter confs — `confMaxItems`/`confMaxBits` MUST be the live
    * session values when those confs are overridden, because
    * `bloom_filter_agg` silently Math.min-clamps to them).
    * Input (doc_id, text); output (doc_id, n_grams, n_flagged,
    * contaminated) for every train doc. */
  def recompute(docs: Seq[(Long, String)], n: Int = 3,
      bitsPerItem: Int = 15, maxBits: Long = 1L << 27,
      confMaxItems: Long = 4000000L, confMaxBits: Long = 1L << 26,
      maxShards: Int = 64)
      : Seq[(Long, Long, Long, Boolean)] = {
    val train = docs.filter(d => splitOf(d._1) == "train").sortBy(_._1)
    val testGrams = docs.filter(d => splitOf(d._1) == "test")
      .flatMap(d => gramsOf(d._2, n))
    if (testGrams.isEmpty)
      return train.map { case (id, t) =>
        (id, gramsOf(t, n).length.toLong, 0L, false)
      }
    val occurrences = testGrams.size.toLong
    val nShards = graft.operators.CorpusFilters.bloomShardCount(
      occurrences, bitsPerItem, maxBits, confMaxItems, confMaxBits, maxShards)
    val perShardOcc = (occurrences + nShards - 1L) / nShards
    val (items, numBits) = graft.operators.CorpusFilters.bloomSizing(
      perShardOcc, bitsPerItem, maxBits, confMaxItems, confMaxBits)
    val bfs = new Array[BloomFilter](nShards)
    testGrams.foreach { g =>
      val h = SfOracles.xxh64(g)
      val s = pmodL(h, nShards.toLong).toInt
      if (bfs(s) == null) bfs(s) = BloomFilter.create(items, numBits)
      bfs(s).putLong(h)
    }
    train.map { case (id, t) =>
      val gs = gramsOf(t, n)
      val flagged = gs.count { g =>
        val h = SfOracles.xxh64(g)
        val bf = bfs(pmodL(h, nShards.toLong).toInt)
        bf != null && bf.mightContainLong(h)
      }
      (id, gs.length.toLong, flagged.toLong, flagged > 0)
    }
  }
}
