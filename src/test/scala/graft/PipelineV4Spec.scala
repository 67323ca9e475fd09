package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract battery for q148 — the composed v4 pipeline (hashed gate →
  * BPE counts → token-budget select → substring dedup → BPE pack) as an
  * oracle query: distributed composition vs the straight-line
  * [[PipelineMirror]] replay, plus the invariants each stage guarantees
  * through the chain. */
class PipelineV4Spec extends AnyFunSuite {
  import SparkSuiteBase.{spark, sfDir}

  test("distributed q148 reproduces the straight-line composed mirror at sf0.001") {
    val docs = Tables(spark, sfDir, "documents")
      .selectExpr("cast(doc_id as long) as doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1).toIndexedSeq
    val want = PipelineMirror.recomputeV4(docs)
    assert(want.nonEmpty, "the gate + budget must select a non-empty set")
    // stage invariants on the mirror values:
    //  - selection is a strict subset (the budget is half the tokens)
    assert(want.size < docs.size)
    //  - the spent budget respects the cap (selected BPE tokens <= half
    //    of the gated total is not directly visible here, but every
    //    cleaned count is bounded by its own pre-dedup count: both are
    //    BPE over the same lowercase token space, dedup only removes)
    want.foreach { case (id, _, nBpe, nSpans, dupToks, nClean, shard, _) =>
      assert(nClean <= nBpe, s"doc $id: cleaned BPE count grew")
      assert((nSpans == 0L) == (dupToks == 0L), s"doc $id: span/token mismatch")
      assert(shard == ((id % 8) + 8) % 8)
    }
    val got = Queries.pipelineV4(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got == want)
  }
}
