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

  test("held-out scoring: hand-computed backoff for seen bigram / unseen bigram / unseen word") {
    import spark.implicits._
    // train: doc0 = "a b a b", doc1 = "a c"
    // unigrams: a=3, b=2, c=1 -> V=3; bigrams: (a,b)=2, (b,a)=1, (a,c)=1
    val train = Seq(0L -> "a b a b", 1L -> "a c").toDF("doc_id", "text")
    // score doc10 = "a b c z a": terms
    //   (a,b) seen bigram:            (2+1)/(3+3) = 1/2
    //   (b,c) unseen bigram, seen b:  (0+1)/(2+3) = 1/5
    //   (c,z) unseen bigram, seen c:  (0+1)/(1+3) = 1/4
    //   (z,a) unseen word z:          (0+1)/(0+3) = 1/3
    val score = Seq(10L -> "a b c z a").toDF("doc_id", "text")
    val out = NgramLM.bigramNllHeldOut(train, score, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nll = e4(1.0 / 2.0) + e4(1.0 / 5.0) + e4(1.0 / 4.0) + e4(1.0 / 3.0)
    assert(out.toSeq == Seq((10L, 4L, 3L, nll)))
  }

  test("held-out scoring: short/empty score docs emit (0,0,0); score side never grows V") {
    import spark.implicits._
    val train = Seq(0L -> "a b").toDF("doc_id", "text") // V=2, (a,b)=1
    val score = Seq(10L -> "", 11L -> "solo", 12L -> "q r")
      .toDF("doc_id", "text")
    val out = NgramLM.bigramNllHeldOut(train, score, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(10L) == ((0L, 0L, 0L)))
    assert(out(11L) == ((0L, 0L, 0L)))
    // (q,r): q unseen -> 1/V = 1/2. If score-side words leaked into V this
    // would be 1/4 — the vocab must be train-only.
    assert(out(12L) == ((1L, 1L, e4(1.0 / 2.0))))
  }

  test("held-out scoring matches a straight-line JVM re-derivation with planted OOV") {
    // score vocab {d..h} overlaps train vocab {a..e} only on {d, e}:
    // every run exercises seen bigrams, unseen bigrams over seen words,
    // and fully unseen words.
    val trainVocab = Vector("a", "b", "c", "d", "e")
    val scoreVocab = Vector("d", "e", "f", "g", "h")
    for (seed <- Seq(5, 17)) {
      val rnd = new scala.util.Random(seed)
      def gen(vocab: Vector[String], n: Int, off: Long) = (0L until n.toLong).map { i =>
        (i + off) -> Vector.fill(rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val trainDocs = gen(trainVocab, 80, 0L)
      val scoreDocs = gen(scoreVocab, 40, 1000L)
      def toks(docs: Seq[(Long, String)]) = docs.map { case (id, t) =>
        id -> t.split("\\s+").filter(_.nonEmpty).toVector
      }
      val tt = toks(trainDocs)
      val uni = tt.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
      val v = uni.size.toLong
      val bg = tt.flatMap { case (_, ts) => ts.sliding(2).filter(_.size == 2).map(p => (p(0), p(1))) }
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val expected = toks(scoreDocs).map { case (id, ts) =>
        val terms = ts.sliding(2).filter(_.size == 2).map { p =>
          val cBg = bg.getOrElse((p(0), p(1)), 0L)
          val pr = (cBg + 1).toDouble / (uni.getOrElse(p(0), 0L) + v)
          (if (cBg == 0L) 1L else 0L, math.round(-math.log(pr) * 1e4))
        }.toVector
        id -> ((terms.size.toLong, terms.map(_._1).sum, terms.map(_._2).sum))
      }.toMap
      val got = NgramLM.bigramNllHeldOut(
          { import spark.implicits._; trainDocs.toDF("doc_id", "text") },
          { import spark.implicits._; scoreDocs.toDF("doc_id", "text") },
          "doc_id", "text")
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      assert(got == expected, s"held-out mirror mismatch at seed=$seed")
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
