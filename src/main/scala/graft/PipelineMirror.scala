package graft

import graft.operators.Bpe

/** Straight-line JVM mirror of q148 — the round-10 operators COMPOSED
  * end to end (the ScaleSmoke e2e v4 recipe promoted to an oracle
  * query): hashed-classifier gate → corpus-trained BPE token counts →
  * token-budget selection → exact substring dedup → BPE packing.
  *
  * Composition is where staging/lineage bugs hide (the round-9
  * two-traversal hazard was exactly this class), so every stage is
  * replayed here through the SAME published per-stage contracts the
  * individual mirrors pin — gate membership via
  * [[QualityMirror.recomputeHashed]], BPE training via
  * [[BpeMirror.tableOf]] + the shared driver `learnMerges`, budget
  * selection as the one global (score desc, id) cumulative sum, span
  * removal via a local replay of the Lee et al. gaps-and-islands
  * algebra, and the q64 packing arithmetic — then chained on the
  * intermediate values, never on the Spark frames under test.
  */
object PipelineMirror {

  /** Spark `trim` (space-only) — the q145 whitespace-token contract. */
  private def sparkTrim(s: String): String = {
    var i = 0
    var j = s.length
    while (i < j && s.charAt(i) == ' ') i += 1
    while (j > i && s.charAt(j - 1) == ' ') j -= 1
    s.substring(i, j)
  }

  /** q145's distinct-token-ratio score: (nd · 1e6) div nt over
    * `split(trim(coalesce(text, '')), "\s+")` tokens (≥ 1 always). */
  private def wsScoreE6(text: String): Long = {
    val toks = sparkTrim(if (text == null) "" else text).split("\\s+", -1)
    toks.distinct.length.toLong * 1000000L / toks.length.toLong
  }

  /** Local replay of `SubstringDedup.dedupText` over a (sub-)corpus:
    * k-gram occurrence counts on the `graft_tokens` token space, hit
    * spans merged when overlapping or adjacent, covered tokens dropped.
    * Returns (doc_id → (n_spans, dup_tokens, cleaned)). */
  private def substrDedupLocal(docs: Seq[(Long, Array[String])], k: Int,
      minRepeat: Int): Map[Long, (Long, Long, String)] = {
    val counts = scala.collection.mutable.HashMap.empty[String, Int]
    docs.foreach { case (_, ts) =>
      var i = 0
      while (i + k <= ts.length) {
        val g = ts.slice(i, i + k).mkString(" ")
        counts.update(g, counts.getOrElse(g, 0) + 1)
        i += 1
      }
    }
    docs.map { case (id, ts) =>
      val hits = (0 to ts.length - k).filter { i =>
        counts(ts.slice(i, i + k).mkString(" ")) >= minRepeat
      }.map(_ + 1) // 1-based starts
      // gaps-and-islands: a hit opens a new span iff it starts past the
      // running max end + 1 (overlapping AND adjacent spans merge)
      val spans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      hits.foreach { p =>
        if (spans.nonEmpty && p <= spans.last._2 + 1)
          spans(spans.length - 1) = (spans.last._1, math.max(spans.last._2, p + k - 1))
        else spans += ((p, p + k - 1))
      }
      val covered = spans.flatMap { case (s, e) => s to e }.toSet
      val cleaned = ts.zipWithIndex.collect {
        case (t, i) if !covered(i + 1) => t
      }.mkString(" ")
      id -> (spans.length.toLong,
        spans.map { case (s, e) => (e - s + 1).toLong }.sum, cleaned)
    }.toMap
  }

  /** q148 contract — defaults match the query: hashed gate at τ=0.5
    * (src0/src1 seeds over the WHOLE corpus, the q144 contract), BPE
    * trained on the gated docs (60 merges, q142 knobs), budget = half
    * the gated BPE tokens spent by (score_e6 desc, doc_id) — q145's
    * distinct-token-ratio score — then substring dedup (k=8) of the
    * selected docs and ctx-512 packing over 8 shards of the CLEANED
    * text's BPE counts.
    *
    * Input (doc_id, text, source); output one row per SELECTED doc,
    * ascending: (doc_id, score_e6, n_tokens_bpe, n_spans, dup_tokens,
    * n_clean_bpe, shard, pack). */
  def recomputeV4(docs: Seq[(Long, String, String)], numMerges: Int = 60,
      ctxLen: Int = 512, nShards: Int = 8)
      : Seq[(Long, Long, Long, Long, Long, Long, Long, Long)] = {
    // 1. hashed gate (the q144 mirror IS the gate contract)
    val keep = QualityMirror.recomputeHashed(docs)
      .collect { case (id, _, _, true) => id }.toSet
    val gated = docs.collect { case (id, t, _) if keep(id) => (id, t) }
      .sortBy(_._1)
    if (gated.isEmpty) return Seq.empty
    // 2. BPE trained on the gated sub-corpus
    val ranks = Bpe.learnMerges(
      BpeMirror.tableOf(gated, 2000, 20000), numMerges).zipWithIndex.toMap
    val counted = gated.map { case (id, t) =>
      (id, wsScoreE6(t), Bpe.countTokens(t, ranks).toLong)
    }
    // 3. token-budget selection: (score desc, id) prefix of half the tokens
    val budget = counted.map(_._3).sum / 2
    var cum = 0L
    val selected = counted.sortBy { case (id, s, _) => (-s, id) }
      .flatMap { case (id, s, w) =>
        cum += w
        if (cum <= budget) Some((id, s, w)) else None
      }
    // 4. substring dedup over the SELECTED docs only
    val textBy = gated.toMap
    val selTok = selected.map { case (id, _, _) =>
      (id, DsirMirror.tokensOf(textBy(id)))
    }
    val cleanedBy = substrDedupLocal(selTok, k = 8, minRepeat = 2)
    // 5. pack the cleaned text's BPE counts (q64 algebra per shard)
    val withClean = selected.map { case (id, s, w) =>
      val (nSpans, dupToks, cleaned) = cleanedBy(id)
      (id, s, w, nSpans, dupToks, Bpe.countTokens(cleaned, ranks).toLong)
    }
    withClean.groupBy { case (id, _, _, _, _, _) => ((id % nShards) + nShards) % nShards }
      .toSeq.flatMap { case (shard, ds) =>
        var c = 0L
        ds.sortBy(_._1).map { case (id, s, w, nSp, dT, nC) =>
          c += nC
          (id, s, w, nSp, dT, nC, shard, (c - nC) / ctxLen)
        }
      }
      .sortBy(_._1)
  }
}
