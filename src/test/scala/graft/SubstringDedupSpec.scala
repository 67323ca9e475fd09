package graft

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.SubstringDedup

/** ExactSubstr dedup on hand-built corpora: planted cross-doc spans,
  * within-doc self-repeats, overlap and adjacency merging, and the
  * no-repeat identity — every expectation derived by hand, cleaned text
  * checked via the same md5 the query surfaces. */
class SubstringDedupSpec extends AnyFunSuite {
  import SparkSuiteBase.{spark, sfDir}

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def run(docs: Seq[(Long, String)], k: Int = 4) = {
    import spark.implicits._
    SubstringDedup.dedupSpans(docs.toDF("doc_id", "text"), "doc_id", "text",
        k = k, minRepeat = 2)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
  }

  test("cross-document planted 4-gram is removed from both docs") {
    // "p q r s" occurs once in each doc; all other tokens are unique.
    val docs = Seq(
      0L -> "a0 a1 p q r s a2 a3",
      1L -> "p q r s b0 b1 b2 b3")
    val out = run(docs)
    assert(out(0L) == ((8L, 1L, 4L, md5hex("a0 a1 a2 a3"))))
    assert(out(1L) == ((8L, 1L, 4L, md5hex("b0 b1 b2 b3"))))
  }

  test("within-doc self-repeat counts toward the corpus threshold") {
    // "x y z w" occurs twice in the SAME doc (positions 1 and 7);
    // spans [1,4] and [7,10] are separated by a 2-token gap -> 2 islands.
    val docs = Seq(0L -> "x y z w g0 g1 x y z w g2")
    val out = run(docs)
    assert(out(0L) == ((11L, 2L, 8L, md5hex("g0 g1 g2"))))
  }

  test("overlapping hits merge into one span") {
    // doc 0 repeats its own prefix at offset 2: grams starting at 1..2
    // are both duplicated (each occurs twice corpus-wide via doc 1),
    // spans [1,4] and [2,5] overlap -> one island [1,5].
    val docs = Seq(
      0L -> "m n m n m t0 t1",
      1L -> "m n m n m u0 u1")
    val out = run(docs)
    // grams of doc 0: (1)"m n m n" (2)"n m n m" (3)"m n m t0" (4)"n m t0 t1"
    // duplicated: (1) and (2) (same in doc 1) -> island [1,5]
    assert(out(0L) == ((7L, 1L, 5L, md5hex("t0 t1"))))
    assert(out(1L) == ((7L, 1L, 5L, md5hex("u0 u1"))))
  }

  test("adjacent spans merge (no 1-token islands survive between hits)") {
    // hits at positions 1 and 5: spans [1,4] and [5,8] are adjacent ->
    // one island of 8 tokens.
    val docs = Seq(
      0L -> "c0 c1 c2 c3 d0 d1 d2 d3 e0",
      1L -> "c0 c1 c2 c3 z0 z1 z2 z3 z4",
      2L -> "y0 d0 d1 d2 d3 y1 y2 y3 y4")
    val out = run(docs)
    assert(out(0L) == ((9L, 1L, 8L, md5hex("e0"))))
    assert(out(1L)._2 == 1L)
    assert(out(2L)._2 == 1L)
  }

  test("no repeats: identity with zero spans; short docs untouched") {
    val docs = Seq(
      0L -> "f0 f1 f2 f3 f4",
      1L -> "g0 g1", // shorter than k: no grams at all
      2L -> "")
    val out = run(docs)
    assert(out(0L) == ((5L, 0L, 0L, md5hex("f0 f1 f2 f3 f4"))))
    assert(out(1L) == ((2L, 0L, 0L, md5hex("g0 g1"))))
    assert(out(2L) == ((0L, 0L, 0L, md5hex(""))))
  }

  test("fully-covered document cleans to the empty string") {
    val docs = Seq(
      0L -> "h0 h1 h2 h3",
      1L -> "h0 h1 h2 h3")
    val out = run(docs)
    assert(out(0L) == ((4L, 1L, 4L, md5hex(""))))
    assert(out(1L) == ((4L, 1L, 4L, md5hex(""))))
  }

  test("matches a straight-line JVM re-derivation on collision-heavy random corpora") {
    // 6-word vocab + k=3 forces dense gram collisions, exercising every
    // merge path (overlap, adjacency, self-repeat, full coverage).
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      val docs = (0L until 120L).map { i =>
        i -> Vector.fill(rnd.nextInt(14))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val k = 3
      // mirror: count grams, collect hit starts, fold into merged spans
      val toks = docs.map { case (id, t) =>
        id -> t.split("\\s+").filter(_.nonEmpty).toVector
      }
      val counts = collection.mutable.Map.empty[String, Int]
      for ((_, ts) <- toks; i <- 0 to ts.length - k)
        counts.updateWith(ts.slice(i, i + k).mkString(" "))(c => Some(c.getOrElse(0) + 1))
      val expected = toks.map { case (id, ts) =>
        val hits = (0 to ts.length - k)
          .filter(i => counts(ts.slice(i, i + k).mkString(" ")) >= 2)
        val spans = hits.foldLeft(Vector.empty[(Int, Int)]) { case (acc, h) =>
          val (s, e) = (h, h + k - 1)
          acc.lastOption match {
            case Some((ps, pe)) if s <= pe + 1 => acc.init :+ (ps, math.max(pe, e))
            case _ => acc :+ (s, e)
          }
        }
        val covered = spans.flatMap { case (s, e) => s to e }.toSet
        val cleaned = ts.zipWithIndex.collect { case (t, i) if !covered(i) => t }.mkString(" ")
        id -> ((ts.length.toLong, spans.length.toLong,
          covered.size.toLong, md5hex(cleaned)))
      }.toMap
      val got = run(docs, k)
      assert(got == expected, s"mirror mismatch at seed=$seed")
    }
  }

  test("dedupText surfaces the cleaned text dedupSpans hashes") {
    import spark.implicits._
    val docs = Seq(
      0L -> "a0 a1 p q r s a2 a3",
      1L -> "p q r s b0 b1 b2 b3",
      2L -> "u0 u1 u2 u3") // untouched: token-normalized identity
    val df = docs.toDF("doc_id", "text")
    val txt = SubstringDedup.dedupText(df, "doc_id", "text", k = 4)
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(txt == Map(0L -> "a0 a1 a2 a3", 1L -> "b0 b1 b2 b3",
      2L -> "u0 u1 u2 u3"))
    // and dedupSpans is exactly md5(dedupText.cleaned) — the q133
    // contract must not drift now that it's a projection
    val viaSpans = SubstringDedup.dedupSpans(df, "doc_id", "text", k = 4)
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(viaSpans == txt.map { case (k, v) => k -> md5hex(v) })
  }

  test("result is partitioning-invariant") {
    import spark.implicits._
    val docs = (0L until 40L).map { i =>
      val planted = if (i % 5 == 0) " p q r s" else ""
      i -> s"w${i}a w${i}b$planted w${i}c w${i}d w${i}e"
    }
    val df1 = docs.toDF("doc_id", "text")
    val df8 = docs.toDF("doc_id", "text").repartition(8, $"doc_id" % 3)
    val a = SubstringDedup.dedupSpans(df1, "doc_id", "text", k = 4)
      .orderBy("doc_id").collect().toSeq
    val b = SubstringDedup.dedupSpans(df8, "doc_id", "text", k = 4)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("single-pass and two-pass plans produce identical bytes") {
    val docs = Tables(spark, sfDir, "documents")
      .selectExpr("cast(doc_id as long) as doc_id", "text")
    def run(threshold: Long) = graft.operators.SubstringDedup
      .dedupSpans(docs, "doc_id", "text", k = 8, minRepeat = 2,
        singlePassMaxDocs = threshold)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .sortBy(_._1).toSeq
    val single = run(Long.MaxValue)
    val two = run(0L)
    assert(single.nonEmpty && single.exists(_._4 > 0L))
    assert(single == two,
      "the adaptive pre-pass skip must not change a single output byte")
  }
}
