package graft

import graft.operators.Bpe

/** Straight-line JVM mirror of q142 (BPE token counts + token-aware
  * packing) for the SF-scale DuckDB oracle.
  *
  * What it independently replays — the DISTRIBUTED machinery under
  * test: md5-bucket sample membership (`MirrorHash.inHashSample`, the
  * `Sampling.hashSample` contract), the sample's exact word counts, the
  * (count DESC, word ASC) `maxWords` vocabulary cut, per-doc subword
  * counting over the `graft_tokens` tokenization, and the q64 packing
  * algebra (shard = id mod nShards, ascending-id running sum, pack =
  * (cumEnd − n) div ctxLen). What it SHARES with the operator:
  * `Bpe.learnMerges`/`encodeWord` — deliberately, because merge
  * learning runs driver-side even in the distributed path (the
  * driver-Lloyd pattern); there is no distributed execution of it for
  * a reimplementation to cross-check, and its determinism is pinned
  * directly by `BpeSpec`'s hand-computed merge vectors. */
object BpeMirror {

  /** q142 contract: train on ≤2000 hash-sampled docs (60 merges, 20k
    * vocab), count BPE tokens per doc, pack at ctxLen=512 over 8 shards.
    * Input (doc_id, text); output (doc_id, n_tokens_bpe, shard, pack)
    * ascending by doc_id. */
  def recompute(docs: Seq[(Long, String)], numMerges: Int = 60,
      sampleCap: Int = 2000, maxWords: Int = 20000,
      ctxLen: Int = 512, nShards: Int = 8): Seq[(Long, Long, Long, Long)] = {
    val n = docs.size
    val sample =
      if (n <= sampleCap) docs
      else docs.filter(d => MirrorHash.inHashSample(d._1, sampleCap.toDouble / n))
    val wc = new scala.collection.mutable.HashMap[String, Long]()
    sample.foreach { case (_, t) =>
      DsirMirror.tokensOf(t).foreach(w => wc.update(w, wc.getOrElse(w, 0L) + 1L))
    }
    val vocab = wc.toSeq.sortBy { case (w, c) => (-c, w) }.take(maxWords)
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
}
