package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** Contract battery for the corpus-trained BPE tokenizer + token-aware
  * packing (q142): hand-computed merge learning on the classic Sennrich
  * corpus, encode semantics, determinism under partitioning, hostile
  * inputs, and the full mirror cross-check on the live sf0.001 corpus. */
class BpeSpec extends AnyFunSuite {
  import SparkSuiteBase.{spark, sfDir}
  import spark.implicits._

  // the Sennrich et al. 2016 worked example
  private val sennrich = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("learnMerges reproduces the hand-computed Sennrich sequence") {
    val merges = Bpe.learnMerges(sennrich, 5)
    // round 1: (e,s)/(s,t)/(t,</w>) all count 9 — lexicographic tie-break
    assert(merges.toSeq == Seq(
      ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w")))
  }

  test("encodeWord applies merges in rank order; OOV falls back to chars") {
    val ranks = Bpe.learnMerges(sennrich, 5).zipWithIndex.toMap
    assert(Bpe.encodeWord("lowest", ranks).toSeq == Seq("low", "est</w>"))
    assert(Bpe.encodeWord("newest", ranks).toSeq == Seq("n", "e", "w", "est</w>"))
    assert(Bpe.encodeWord("xyz", ranks).toSeq == Seq("x", "y", "z", "</w>"))
    assert(Bpe.countTokens("lowest newest xyz", ranks) == 2 + 4 + 4)
    assert(Bpe.countTokens(null, ranks) == 0)
    assert(Bpe.countTokens("   ", ranks) == 0)
    // no merges learned → pure character tokenizer (+ EOW)
    assert(Bpe.countTokens("ab c", Map.empty) == 3 + 2)
  }

  test("merge learning exhausts gracefully when the corpus runs dry") {
    // "aa" x1: pairs (a,a), (a,</w>) → 2 merges possible, then single
    // symbols per word — asking for 10 returns what exists
    val merges = Bpe.learnMerges(Seq(("aa", 1L)), 10)
    assert(merges.length <= 3 && merges.nonEmpty)
    val ranks = merges.zipWithIndex.toMap
    assert(Bpe.countTokens("aa", ranks) == 1)
  }

  test("distributed token counts match the JVM path on adversarial strings") {
    val ranks = Bpe.learnMerges(sennrich, 5).zipWithIndex.toMap
    val samples = Seq(null.asInstanceOf[String], "", " ", "Lowest NEWEST",
      "ü ü", "mixed lowest 42", "a  double  spaced  line", "😀 low 😀")
    val cnt = Bpe.tokenCountCol(Bpe.learnMerges(sennrich, 5))
    val got = samples.toDF("text").select(cnt($"text").as("n"))
      .collect().map(_.getInt(0))
    samples.zip(got).foreach { case (s, g) =>
      assert(g == Bpe.countTokens(s, ranks),
        s"count mismatch for ${Option(s).map(_.take(20))}")
    }
  }

  test("vocabOf assigns hand-computed stable ids; encodeWordIds maps " +
      "units through them with unk fallback") {
    val merges = Bpe.learnMerges(sennrich, 5)
    val vocab = Bpe.vocabOf(sennrich, merges)
    // <unk>, </w>, sorted distinct chars d e i l n o r s t w, then merge
    // products in rank order
    assert(vocab.toSeq == Seq("<unk>", "</w>",
      "d", "e", "i", "l", "n", "o", "r", "s", "t", "w",
      "es", "est", "est</w>", "lo", "low"))
    val ranks = merges.zipWithIndex.toMap
    val idx = vocab.zipWithIndex.toMap
    // "lowest" -> [low, est</w>] -> [16, 14]
    assert(Bpe.encodeWordIds("lowest", ranks, idx).toSeq == Seq(16, 14))
    // unseen chars x/y/z -> unk, trailing bare </w> -> 1
    assert(Bpe.encodeWordIds("xyz", ranks, idx).toSeq == Seq(0, 0, 0, 1))
    // duplicate merge product: first occurrence wins, no double entry
    val dup = Bpe.vocabOf(Seq(("abc", 1L)),
      Array(("a", "b"), ("ab", "c"), ("a", "bc")))
    assert(dup.count(_ == "abc") == 1)
  }

  test("distributed token-id arrays match the JVM path on adversarial strings") {
    val merges = Bpe.learnMerges(sennrich, 5)
    val vocab = Bpe.vocabOf(sennrich, merges)
    val ranks = merges.zipWithIndex.toMap
    val idx = vocab.zipWithIndex.toMap
    val samples = Seq(null.asInstanceOf[String], "", " ", "Lowest NEWEST",
      "ü ü", "mixed lowest 42", "a  double  spaced  line", "😀 low 😀")
    val idsCol = Bpe.tokenIdsCol(merges, vocab)
    val got = samples.toDF("text").select(idsCol($"text").as("ids"))
      .collect().map(_.getSeq[Int](0).toSeq)
    samples.zip(got).foreach { case (s, g) =>
      val want = DsirMirror.tokensOf(s)
        .flatMap(w => Bpe.encodeWordIds(w, ranks, idx)).toSeq
      assert(g == want, s"id mismatch for ${Option(s).map(_.take(20))}")
    }
  }

  test("training is invariant to input partitioning") {
    val docs = Tables(spark, sfDir, "documents")
      .selectExpr("cast(doc_id as long) as doc_id", "text")
    val m1 = Bpe.train(docs, "doc_id", "text", numMerges = 50)
    val m2 = Bpe.train(docs.repartition(13), "doc_id", "text", numMerges = 50)
    assert(m1.toSeq == m2.toSeq)
    assert(m1.length == 50)
  }

  test("distributed q142 reproduces the straight-line mirror at sf0.001") {
    val docs = Tables(spark, sfDir, "documents")
      .selectExpr("cast(doc_id as long) as doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toIndexedSeq
    val want = BpeMirror.recompute(docs)
    assert(want.nonEmpty)
    // subword counts must differ from whitespace counts somewhere —
    // otherwise the query is vacuously "token-aware"
    val ws = docs.map(d => DsirMirror.tokensOf(d._2).length.toLong)
    assert(want.map(_._2) != ws.toSeq)
    val got = Queries.bpePacking(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
  }

  test("distributed q147 reproduces the straight-line id-chunk mirror at sf0.001") {
    val docs = Tables(spark, sfDir, "documents")
      .selectExpr("cast(doc_id as long) as doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toIndexedSeq
    val want = BpeMirror.recomputeIds(docs)
    assert(want.nonEmpty && want.exists(_._3 > 1),
      "corpus should contain multi-chunk docs")
    // BPE ids per doc must outnumber whitespace tokens somewhere (subword
    // splitting) — otherwise the id stream is vacuously word-level
    val ws = docs.map(d => DsirMirror.tokensOf(d._2).length.toLong)
    assert(want.map(_._2).zip(ws).exists { case (n, w) => n > w })
    val got = Queries.bpeChunkIds(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(got == want)
  }

  test("packByBpeWithIds: id arrays ride the q142 pack assignment unchanged") {
    val docs = Tables(spark, sfDir, "documents")
      .selectExpr("cast(doc_id as long) as doc_id", "text")
    val (merges, vocab) = Bpe.trainWithVocab(docs, "doc_id", "text", numMerges = 60)
    val plain = Queries.bpePacking(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val withIds = Bpe.packByBpeWithIds(
        docs, "doc_id", "text", merges, vocab, ctxLen = 512, nShards = 8)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1).length, r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    // count == |ids| by construction, and (count, shard, pack) must all
    // match the count-only packer bit for bit
    withIds.foreach { case (_, nIds, n, _, _) => assert(nIds.toLong == n) }
    assert(withIds.map(t => (t._1, t._3, t._4, t._5)) == plain)
  }
}
