package graft

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Bm25

/** Contract battery for BM25 top-k retrieval (q152): operator output
  * equals a straight-line JVM mirror of the published formula (same
  * tokenization, StrictMath.log — Spark's ln on every path — and
  * HALF_UP e4 rounding, summed exactly as BIGINT), on hand-built corpora
  * exercising tf saturation, length normalization, idf ordering, absent
  * terms, empty docs, and tie-breaks; plus partitioning invariance. */
class Bm25Spec extends AnyFunSuite {
  import SparkSuiteBase.spark
  import spark.implicits._

  /** Straight-line BM25 mirror — never the Spark frames under test. */
  private def mirror(docs: Seq[(Long, String)], queries: Seq[(Long, String)],
      k: Int): Seq[(Long, Long, Long, Long)] = {
    def words(s: String): Seq[String] =
      s.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val toks = docs.map { case (id, t) => (id, words(t)) }
    val n = toks.size.toLong
    val sumdl = toks.map(_._2.size.toLong).sum
    val avgdl = sumdl.toDouble / n
    val qset = queries.map(_._2).toSet
    val post = for {
      (id, ts) <- toks
      (term, grp) <- ts.groupBy(identity).toSeq if qset.contains(term)
    } yield (id, term, grp.size.toLong, ts.size.toLong)
    val dfm = post.groupBy(_._2).map { case (t, ps) => t -> ps.size.toLong }
    val contribs = for {
      (qid, term) <- queries.distinct
      (id, t, tf, dl) <- post if t == term
    } yield {
      val idf = StrictMath.log(
        1.0 + (n - dfm(term) + 0.5) / (dfm(term) + 0.5))
      val tfp = (tf * (1.2 + 1.0)) /
        (tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl / avgdl)))
      ((qid, id),
        new JBigDecimal(idf * tfp * 1e4)
          .setScale(0, RoundingMode.HALF_UP).longValue)
    }
    contribs.groupBy(_._1).toSeq
      .map { case ((qid, id), cs) => (qid, id, cs.map(_._2).sum) }
      .groupBy(_._1).toSeq.flatMap { case (qid, rows) =>
        rows.sortBy { case (_, id, s) => (-s, id) }.take(k)
          .zipWithIndex.map { case ((_, id, s), i) => (qid, i + 1L, id, s) }
      }.sortBy(r => (r._1, r._2))
  }

  private def run(docs: Seq[(Long, String)], queries: Seq[(Long, String)],
      k: Int, nPart: Int = 1): Seq[(Long, Long, Long, Long)] = {
    val d = docs.toDF("doc_id", "text")
    Bm25.topK(if (nPart > 1) d.repartition(nPart) else d, "doc_id", "text",
        queries.toDF("qid", "term"), k)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(r => (r._1, r._2)).toSeq
  }

  private val corpus = Seq(
    1L -> "apple banana apple cherry",
    2L -> "banana banana date",
    3L -> "Apple cherry cherry date egg fig grape",
    4L -> "",                       // empty doc: no postings, never ranked
    5L -> "apple apple apple apple apple apple apple apple",
    6L -> "cherry date")
  private val qs = Seq(
    10L -> "apple", 10L -> "cherry",  // multi-term query
    20L -> "banana",
    30L -> "zebra")                   // absent term: qid 30 emits nothing

  test("operator equals the straight-line mirror; absent term emits no rows") {
    val got = run(corpus, qs, 3)
    val exp = mirror(corpus, qs, 3)
    assert(got == exp)
    assert(!got.exists(_._1 == 30L))
    // tf saturation sanity: doc 5 (8x apple) must not score 8x doc 1
    val d5 = got.find(r => r._1 == 10L && r._3 == 5L).map(_._4)
    val d1 = got.find(r => r._1 == 10L && r._3 == 1L).map(_._4)
    assert(d5.nonEmpty || d1.nonEmpty) // at least one ranked for term apple
  }

  test("case-folding: 'Apple' matches; k larger than candidates returns all") {
    val got = run(corpus, Seq(7L -> "apple"), 100)
    val exp = mirror(corpus, Seq(7L -> "apple"), 100)
    assert(got == exp)
    assert(got.map(_._3).toSet == Set(1L, 3L, 5L)) // docs containing apple
  }

  test("partitioning-invariant, bit-exact scores (multi-slice corpus)") {
    // 300 docs with skewed term frequencies so contributions vary widely
    val docs = (0L until 300L).map { i =>
      val ws = Seq.fill((i % 7 + 1).toInt)(s"w${i % 11}") ++
        Seq.fill((i % 3 + 1).toInt)("common") :+ s"rare$i"
      i -> ws.mkString(" ")
    }
    val queries = Seq(1L -> "common", 1L -> "w3", 2L -> "w7", 2L -> "rare42")
    val base = run(docs, queries, 10)
    assert(base == mirror(docs, queries, 10))
    assert(run(docs, queries, 10, nPart = 13) == base)
  }

  test("batch-shape WAND prune == unpruned path row-for-row (forced via " +
      "pruneMinPostings = 0) on the skewed multi-slice corpus") {
    val docs = (0L until 300L).map { i =>
      val ws = Seq.fill((i % 7 + 1).toInt)(s"w${i % 11}") ++
        Seq.fill((i % 3 + 1).toInt)("common") :+ s"rare$i"
      i -> ws.mkString(" ")
    }
    val queries = Seq(1L -> "common", 1L -> "w3", 2L -> "w7", 2L -> "rare42",
      3L -> "common", 4L -> "zebra")
    def go(pruned: Boolean, k: Int, semiMin: Long = 50000000L) =
      Bm25.topK(docs.toDF("doc_id", "text"), "doc_id", "text",
          queries.toDF("qid", "term"), k,
          prune = pruned, pruneMinPostings = 0L, pruneMinMaxDf = 0L,
          semiJoinMinPrunable = semiMin)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(r => (r._1, r._2)).toSeq
    for (k <- Seq(1, 5, 20)) {
      val p = go(pruned = true, k)
      val exact = go(pruned = false, k)
      assert(p == exact, s"batch WAND lost rows at k=$k")
      // candidate semi-join forced on: still lossless
      assert(go(pruned = true, k, semiMin = 0L) == exact,
        s"batch candidate semi-join lost rows at k=$k")
      assert(p.nonEmpty)
    }
  }

  test("tie-break: equal scores rank by doc_id ascending") {
    // two identical docs -> identical scores for the same query term
    val docs = Seq(1L -> "x y", 2L -> "x y", 3L -> "z")
    val got = run(docs, Seq(1L -> "x"), 2)
    assert(got.map(r => (r._2, r._3)) == Seq((1L, 1L), (2L, 2L)))
    assert(got(0)._4 == got(1)._4)
  }
}
