package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Contract battery for incremental fuzzy dedup (q153,
  * `Dedup.minhashIncremental`): hand-planted near-dup relationships
  * (history copies, in-batch pairs, fresh docs) classified exactly, the
  * straight-line `DedupGolden.recomputeIncrementalFor` mirror equality on
  * a randomized corpus, status precedence (dup_history beats dup_batch),
  * and partitioning invariance. */
class MinhashIncrementalSpec extends AnyFunSuite {
  import SparkSuiteBase.spark
  import spark.implicits._

  private def words(group: String, n: Int): IndexedSeq[String] =
    (0 until n).map(i => s"${group}w$i")
  private def variant(group: String, base: IndexedSeq[String], subs: Seq[Int]): String =
    subs.foldLeft(base) { (ws, i) => ws.updated(i, s"${group}x$i") }.mkString(" ")

  private def run(incoming: Seq[(Long, String)], history: Seq[(Long, String)],
      nPart: Int = 1): Seq[(Long, String, Long)] = {
    val inc = incoming.toDF("doc_id", "text")
    Dedup.minhashIncremental(
        if (nPart > 1) inc.repartition(nPart) else inc,
        history.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq
  }

  test("planted classifications: history near-dup / in-batch pair / fresh") {
    val a = words("a", 50); val b = words("b", 50); val c = words("c", 50)
    val history = Seq(
      0L -> a.mkString(" "),
      2L -> b.mkString(" "),
      4L -> words("h", 50).mkString(" "))
    val incoming = Seq(
      1L -> variant("a", a, Seq(25)),          // near-dup of history doc 0
      3L -> a.mkString(" "),                   // exact copy of history doc 0
      5L -> c.mkString(" "),                   // first of an in-batch pair
      7L -> variant("c", c, Seq(10)),          // near-dup of incoming doc 5
      9L -> words("f", 50).mkString(" "))      // fresh
    val got = run(incoming, history)
    assert(got == Seq(
      (1L, "dup_history", 1L), (3L, "dup_history", 1L),
      (5L, "new", 0L), (7L, "dup_batch", 0L), (9L, "new", 0L)))
    // mirror agrees on the same corpus
    assert(got == DedupGolden.recomputeIncrementalFor(incoming, history))
  }

  test("precedence: a doc matching history AND an earlier batch doc is dup_history") {
    val a = words("p", 50)
    val history = Seq(0L -> a.mkString(" "))
    val incoming = Seq(
      1L -> variant("p", a, Seq(3)),  // matches history (and doc 3 below)
      3L -> variant("p", a, Seq(7)))  // matches history AND earlier doc 1
    val got = run(incoming, history)
    assert(got.forall(_._2 == "dup_history"))
    assert(got == DedupGolden.recomputeIncrementalFor(incoming, history))
  }

  test("mirror equality on a randomized 400-doc corpus; partitioning-invariant") {
    // 5%-dup blocks like the scale generator: every block of 20 shares a
    // seed, so batch/history splits plant cross- and within-side dups
    val rnd = new scala.util.Random(42)
    val all = (0L until 400L).map { i =>
      val seed = if (i % 100 < 10) i - (i % 20) else i
      val base = (0 until 30).map(k => s"t${seed}_${k}")
      // perturb one word for odd ids so near-(not exact-)dups exist
      val ws = if (seed != i && i % 2 == 1)
        base.updated(rnd.nextInt(30), s"z$i") else base
      i -> ws.mkString(" ")
    }
    val incoming = all.filter(_._1 % 2 == 1)
    val history = all.filter(_._1 % 2 == 0)
    val got = run(incoming, history)
    assert(got == DedupGolden.recomputeIncrementalFor(incoming, history))
    assert(got.exists(_._2 == "dup_history"), "corpus must plant history dups")
    assert(run(incoming, history, nPart = 7) == got)
  }
}
