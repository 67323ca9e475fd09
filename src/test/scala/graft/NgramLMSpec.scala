package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.NgramLM

/** Bigram-LM scoring on a corpus small enough to compute add-one
  * probabilities by hand, plus the exact-integer partitioning-invariance
  * the operator is designed around. */
class NgramLMSpec extends AnyFunSuite {
  import SparkSuiteBase.spark

  private def e4(p: Double): Long = math.round(-math.log(p) * 1e4)

  test("hand-computed add-one bigram NLL") {
    import spark.implicits._
    // corpus: doc0 = "a b a b", doc1 = "a c"
    // unigrams: a=3, b=2, c=1 -> V=3
    // bigram counts: (a,b)=2, (b,a)=1, (a,c)=1
    val out = NgramLM.bigramNll(
        Seq(0L -> "a b a b", 1L -> "a c").toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc0 terms: (a,b): (2+1)/(3+3)=1/2 twice; (b,a): (1+1)/(2+3)=2/5
    val doc0 = 2 * e4(3.0 / 6.0) + e4(2.0 / 5.0)
    // doc1 term: (a,c): (1+1)/(3+3)=1/3
    val doc1 = e4(2.0 / 6.0)
    assert(out(0L) == ((3L, doc0)))
    assert(out(1L) == ((1L, doc1)))
  }

  test("short and empty docs score (0, 0)") {
    import spark.implicits._
    val out = NgramLM.bigramNll(
        Seq(0L -> "solo", 1L -> "", 2L -> "x y").toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(0L) == ((0L, 0L)))
    assert(out(1L) == ((0L, 0L)))
    // "x y": (x,y)=1, x uni=1, V=3 (vocab {solo, x, y}; the empty doc
    // contributes nothing)
    assert(out(2L)._1 == 1L)
  }

  test("frequent sequences score lower than rare ones") {
    import spark.implicits._
    val docs = (0L until 20L).map(i => i -> "the quick fox") ++
      Seq(20L -> "zebra quantum polka")
    val out = NgramLM.bigramNll(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(0L) < out(20L),
      "a document of corpus-typical bigrams must score below a one-off")
  }

  test("matches a straight-line JVM re-derivation on random corpora") {
    val vocab = Vector("a", "b", "c", "d", "e")
    for (seed <- Seq(3, 11)) {
      val rnd = new scala.util.Random(seed)
      val docs = (0L until 100L).map { i =>
        i -> Vector.fill(rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val toks = docs.map { case (id, t) =>
        id -> t.split("\\s+").filter(_.nonEmpty).toVector
      }
      val uni = toks.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
      val v = uni.size.toLong
      val bg = toks.flatMap { case (_, ts) => ts.sliding(2).filter(_.size == 2).map(p => (p(0), p(1))) }
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val expected = toks.map { case (id, ts) =>
        val terms = ts.sliding(2).filter(_.size == 2).map { p =>
          val pr = (bg((p(0), p(1))) + 1).toDouble / (uni(p(0)) + v)
          math.round(-math.log(pr) * 1e4)
        }.toVector
        id -> ((terms.size.toLong, terms.sum))
      }.toMap
      val got = NgramLM.bigramNll(
          { import spark.implicits._; docs.toDF("doc_id", "text") },
          "doc_id", "text")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got == expected, s"mirror mismatch at seed=$seed")
    }
  }

  test("BIGINT fixed-point sum is partitioning-invariant") {
    import spark.implicits._
    val docs = (0L until 60L).map(i =>
      i -> s"w${i % 7} w${i % 5} w${i % 3} w${i % 11} w${i % 5}")
    val df1 = docs.toDF("doc_id", "text")
    val df9 = docs.toDF("doc_id", "text").repartition(9, $"doc_id" % 4)
    val a = NgramLM.bigramNll(df1, "doc_id", "text").orderBy("doc_id").collect().toSeq
    val b = NgramLM.bigramNll(df9, "doc_id", "text").orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}
