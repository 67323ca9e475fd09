package graft

import graft.operators.Bpe

/** Straight-line JVM mirror of q142 (BPE token counts + token-aware
  * packing) and q147 (BPE token-ID chunk digests) for the SF-scale
  * DuckDB oracle.
  *
  * What it independently replays — the DISTRIBUTED machinery under
  * test: md5-bucket sample membership (`MirrorHash.inHashSample`, the
  * `Sampling.hashSample` contract), the sample's exact word counts, the
  * (count DESC, word ASC) `maxWords` vocabulary cut, per-doc subword
  * counting / id encoding over the `graft_tokens` tokenization, the q64
  * packing algebra (shard = id mod nShards, ascending-id running sum,
  * pack = (cumEnd − n) div ctxLen), and q147's sliding-window digest
  * (the `Chunker.strideChunkDigest` arithmetic: per-chunk md5 of the
  * ','-joined ids, '|'-joined chain md5 per doc). What it SHARES with
  * the operator: `Bpe.learnMerges`/`encodeWord`/`vocabOf` —
  * deliberately, because merge learning runs driver-side even in the
  * distributed path (the driver-Lloyd pattern); there is no distributed
  * execution of it for a reimplementation to cross-check, and its
  * determinism is pinned directly by `BpeSpec`'s hand-computed merge
  * vectors. */
object BpeMirror {

  /** The `Bpe.trainTable` contract replayed locally: hash-sample
    * membership, exact word counts, (count DESC, word ASC) cut.
    * Shared with [[PipelineMirror]] (q148 trains BPE on the gated
    * sub-corpus through the same contract). */
  private[graft] def tableOf(docs: Seq[(Long, String)], sampleCap: Int,
      maxWords: Int): Seq[(String, Long)] = {
    val n = docs.size
    val sample =
      if (n <= sampleCap) docs
      else docs.filter(d => MirrorHash.inHashSample(d._1, sampleCap.toDouble / n))
    val wc = new scala.collection.mutable.HashMap[String, Long]()
    sample.foreach { case (_, t) =>
      DsirMirror.tokensOf(t).foreach(w => wc.update(w, wc.getOrElse(w, 0L) + 1L))
    }
    wc.toSeq.sortBy { case (w, c) => (-c, w) }.take(maxWords)
  }

  /** q142 contract: train on ≤2000 hash-sampled docs (60 merges, 20k
    * vocab), count BPE tokens per doc, pack at ctxLen=512 over 8 shards.
    * Input (doc_id, text); output (doc_id, n_tokens_bpe, shard, pack)
    * ascending by doc_id. */
  def recompute(docs: Seq[(Long, String)], numMerges: Int = 60,
      sampleCap: Int = 2000, maxWords: Int = 20000,
      ctxLen: Int = 512, nShards: Int = 8): Seq[(Long, Long, Long, Long)] = {
    val vocab = tableOf(docs, sampleCap, maxWords)
    val ranks = Bpe.learnMerges(vocab, numMerges).zipWithIndex.toMap

    val counted = docs.map { case (id, t) =>
      (id, Bpe.countTokens(t, ranks).toLong)
    }
    // q64 packing algebra per shard
    counted.groupBy { case (id, _) => ((id % nShards) + nShards) % nShards }
      .toSeq.flatMap { case (shard, ds) =>
        var cum = 0L
        ds.sortBy(_._1).map { case (id, c) =>
          cum += c
          (id, c, shard, (cum - c) / ctxLen)
        }
      }
      .sortBy(_._1)
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  /** q147 contract: same training as q142 (60 merges), stable token ids
    * via `Bpe.vocabOf`, every doc's flattened id stream chunked into
    * 32-id windows at stride 24, digested as per-chunk md5s chained into
    * one md5 per doc (the `Chunker.strideChunkDigest` arithmetic; 0
    * tokens → 0 chunks → md5 of the empty chain). Input (doc_id, text);
    * output (doc_id, n_ids, n_chunks, chunks_md5) ascending by doc_id. */
  def recomputeIds(docs: Seq[(Long, String)], numMerges: Int = 60,
      sampleCap: Int = 2000, maxWords: Int = 20000,
      chunkLen: Int = 32, stride: Int = 24): Seq[(Long, Long, Long, String)] = {
    val table = tableOf(docs, sampleCap, maxWords)
    val merges = Bpe.learnMerges(table, numMerges)
    val ranks = merges.zipWithIndex.toMap
    val vIdx = Bpe.vocabOf(table, merges).zipWithIndex.toMap
    docs.sortBy(_._1).map { case (id, t) =>
      val ids = DsirMirror.tokensOf(t)
        .flatMap(w => Bpe.encodeWordIds(w, ranks, vIdx))
      val n = ids.length
      val nChunks =
        if (n == 0) 0 else (math.max(n - chunkLen, 0) + stride - 1) / stride + 1
      val chunkMd5s = (0 until nChunks).map { i =>
        md5Hex(ids.slice(i * stride, math.min(i * stride + chunkLen, n)).mkString(","))
      }
      (id, n.toLong, nChunks.toLong, md5Hex(chunkMd5s.mkString("|")))
    }
  }
}
