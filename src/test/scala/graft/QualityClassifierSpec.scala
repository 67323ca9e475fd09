package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.QualityClassifier

/** Contract battery for the seed-trained quality classifier (q140):
  * learned separation on planted classes, distributed-vs-mirror feature
  * parity on adversarial strings, partitioning-invariance, and the full
  * mirror cross-check on the live sf0.001 corpus. */
class QualityClassifierSpec extends AnyFunSuite {
  import SparkSuiteBase.{spark, sfDir}
  import spark.implicits._

  // clean prose vs punctuation/digit soup — linearly separable features
  private val cleanText =
    "a modest paragraph of ordinary readable prose with varied simple words " * 3
  private val soupText = "@@!! 4242 ### $$$ 777 %%% !!! 99 &&& ((( ))) 1234 " * 3
  private def posDf = (0 until 30).map(i => (100L + i, cleanText)).toDF("doc_id", "text")
  private def negDf = (200 until 230).map(i => (i.toLong, soupText)).toDF("doc_id", "text")

  test("classifier separates planted clean vs soup classes") {
    val raw = posDf.union(negDf)
    val out = QualityClassifier.trainAndScore(raw, posDf, negDf, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val (posRows, negRows) = out.partition(_._1 < 200L)
    assert(posRows.forall(_._3) && negRows.forall(r => !r._3),
      "every clean doc kept, every soup doc dropped")
    assert(posRows.map(_._2).min > negRows.map(_._2).max)
  }

  test("distributed features match the mirror on adversarial strings") {
    val samples = Seq(null.asInstanceOf[String], "", " ", "   ", "\t leading tab",
      "plain words here", "1234 5678", "!!!", "ü ü ü", "mixed 42 !x? ok",
      "a  double  spaced  line ", " nbsp is not trimmed", "😀 emoji 😀 text")
    val dist = samples.toDF("text")
      .select(QualityClassifier.featureCols($"text").as("f"))
      .select($"f.*").collect()
      .map(r => (0 until QualityClassifier.FeatureNames.length).map(r.getDouble).toArray)
    samples.zip(dist).foreach { case (s, got) =>
      val want = QualityMirror.featuresOf(s)
      assert(got.sameElements(want),
        s"feature mismatch for ${Option(s).map(_.take(20))}: got ${got.toSeq} want ${want.toSeq}")
    }
  }

  test("output is invariant to input partitioning (determinism contract)") {
    val raw = posDf.union(negDf)
    val base = QualityClassifier.trainAndScore(raw, posDf, negDf, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1).toSeq
    val repart = QualityClassifier.trainAndScore(
        raw.repartition(11), posDf.repartition(5), negDf.repartition(3), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1).toSeq
    assert(base == repart)
  }

  test("distributed q140 reproduces the straight-line mirror at sf0.001") {
    val docs = Tables(spark, sfDir, "documents")
      .selectExpr("cast(doc_id as long) as doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1).toIndexedSeq
    val want = QualityMirror.recompute(docs)
    assert(want.nonEmpty)
    val got = Queries.qualityClassifier(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(got == want)
  }

  test("sampling path stays deterministic above the cap") {
    // 3000 pos docs > cap 2000 exercises the md5-hash sample membership
    val bigPosSeq = (0 until 3000).map(i => (i.toLong, cleanText))
    val bigPos = bigPosSeq.toDF("doc_id", "text")
    val w1 = QualityClassifier.train(bigPos, negDf, "doc_id", "text")
    val w2 = QualityClassifier.train(bigPos.repartition(7), negDf, "doc_id", "text")
    assert(w1.sameElements(w2))
    // and the MIRROR must agree above the cap too — pins the
    // hash-sample membership contract (Sampling.hashSample vs
    // MirrorHash.inHashSample) where a drift would otherwise surface
    // only as a large-SF oracle failure
    val wm = QualityMirror.train(
      bigPosSeq, (200 until 230).map(i => (i.toLong, soupText)))
    assert(w1.sameElements(wm),
      "distributed train and mirror train must produce identical weights above sampleCap")
  }

  test("argument validation") {
    intercept[IllegalArgumentException] {
      QualityClassifier.score(posDf, "doc_id", "text", Array(0.0, 1.0))
    }
    intercept[IllegalArgumentException] {
      QualityClassifier.train(posDf, negDf, "doc_id", "text", sampleCap = 0)
    }
  }

  // ---------------------------------------------------------------
  // q144: hashed-n-gram variant
  // ---------------------------------------------------------------

  // same surface SHAPE (word lengths, no punctuation/digits), disjoint
  // VOCABULARY — the 5 hand features cannot separate these, hashed
  // n-grams must
  private val vocabPosText =
    "gentle meadow rivers carry quiet morning light across green valley fields " * 3
  private val vocabNegText =
    "broken jagged cinder blocks litter empty parking garage concrete floors " * 3
  private def vocabPos =
    (0 until 30).map(i => (100L + i, vocabPosText)).toDF("doc_id", "text")
  private def vocabNeg =
    (200 until 230).map(i => (i.toLong, vocabNegText)).toDF("doc_id", "text")

  test("hashed classifier separates planted disjoint-vocabulary classes") {
    val raw = vocabPos.union(vocabNeg)
    val out = QualityClassifier.trainAndScoreHashed(
        raw, vocabPos, vocabNeg, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
    val (posRows, negRows) = out.partition(_._1 < 200L)
    assert(posRows.forall(_._3) && negRows.forall(r => !r._3),
      "every pos-vocabulary doc kept, every neg-vocabulary doc dropped")
    assert(posRows.map(_._2).min > negRows.map(_._2).max)
    // capability gain over q140: the 5 shape features CANNOT separate
    // these (both classes are clean prose) — the hand-feature model
    // scores the two classes identically
    val flat = QualityClassifier.trainAndScore(
        raw, vocabPos, vocabNeg, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val (fp, fn) = flat.partition(_._1 < 200L)
    assert(fp.map(_._2).max - fn.map(_._2).min < 200000,
      "planted classes must NOT be shape-separable (else the test is vacuous)")
  }

  test("hashed planted accuracy on the clean-vs-soup classes too") {
    val raw = posDf.union(negDf)
    val out = QualityClassifier.trainAndScoreHashed(raw, posDf, negDf, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
    val (posRows, negRows) = out.partition(_._1 < 200L)
    assert(posRows.forall(_._3) && negRows.forall(r => !r._3))
  }

  test("trainSparse determinism pinned by hand-planted vectors") {
    // two docs, D = 8: doc A has bucket 1 twice + bucket 3 once (n=3),
    // doc B has bucket 2 once (n=1). One GD iteration from zero init:
    // p = 0.5 for every doc, err = p - y = ∓0.5,
    // g_bias = (-0.5 + 0.5) = 0; g[1+1] = -0.5·(2/3); g[3+1] = -0.5·(1/3);
    // g[2+1] = +0.5·1. With lr=0.5, invN=0.5: w = -0.25·g.
    val rows = Seq(
      (Array((1, 2L), (3, 1L)), 3L, 1.0),
      (Array((2, 1L)), 1L, 0.0))
    val w = QualityClassifier.trainSparse(rows, buckets = 8,
      iterations = 1, learningRate = 0.5)
    assert(w(0) == 0.0)
    assert(w(2) == -0.25 * (-0.5 * (2.0 / 3.0)))
    assert(w(4) == -0.25 * (-0.5 * (1.0 / 3.0)))
    assert(w(3) == -0.25 * (0.5 * 1.0))
    assert((1 to 8).forall(k => k == 2 || k == 3 || k == 4 || w(k) == 0.0))
  }

  test("hashed output is invariant to input partitioning") {
    val raw = vocabPos.union(vocabNeg)
    val base = QualityClassifier.trainAndScoreHashed(raw, vocabPos, vocabNeg,
        "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1).toSeq
    val repart = QualityClassifier.trainAndScoreHashed(
        raw.repartition(11), vocabPos.repartition(5), vocabNeg.repartition(3),
        "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1).toSeq
    assert(base == repart)
  }

  test("distributed q144 reproduces the straight-line mirror at sf0.001") {
    val docs = Tables(spark, sfDir, "documents")
      .selectExpr("cast(doc_id as long) as doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1).toIndexedSeq
    val want = QualityMirror.recomputeHashed(docs)
    assert(want.nonEmpty)
    val got = Queries.hashedQualityClassifier(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
    assert(got == want)
  }

  test("hashed sampling + training stay mirror-identical above the cap") {
    val bigPosSeq = (0 until 3000).map(i => (i.toLong, vocabPosText))
    val negSeq = (200 until 230).map(i => (i.toLong, vocabNegText))
    val bigPos = bigPosSeq.toDF("doc_id", "text")
    val w1 = QualityClassifier.trainHashed(bigPos, vocabNeg, "doc_id", "text")
    val w2 = QualityClassifier.trainHashed(
      bigPos.repartition(7), vocabNeg, "doc_id", "text")
    assert(w1.sameElements(w2))
    val wm = QualityMirror.trainHashed(bigPosSeq, negSeq)
    assert(w1.sameElements(wm),
      "distributed trainHashed and mirror must produce identical weights above sampleCap")
  }

  test("hashed argument validation + null/empty text scoring") {
    intercept[IllegalArgumentException] {
      QualityClassifier.scoreHashed(posDf, "doc_id", "text",
        Array(0.0, 1.0), buckets = 4096)
    }
    intercept[IllegalArgumentException] {
      QualityClassifier.trainHashed(posDf, negDf, "doc_id", "text", buckets = 1)
    }
    // null/empty docs score at sigmoid(bias) with n_grams = 0
    val w = QualityClassifier.trainHashed(vocabPos, vocabNeg, "doc_id", "text")
    val edge = Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, "   "))
      .toDF("doc_id", "text")
    val out = QualityClassifier.scoreHashed(edge, "doc_id", "text", w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val biasScore = (1.0 / (1.0 + StrictMath.exp(-w(0))) * 1e6 + 0.5).toLong
    assert(out.forall { case (_, n, s) => n == 0L && s == biasScore })
  }

  test("evaluateHashed: perfect confusion on planted separable classes, " +
      "metrics arithmetic exact") {
    // disjoint train/eval ids; vocab-separable classes -> the held-out
    // confusion must be perfect and the e6 metrics exactly 1e6
    val evalDf = ((300 until 320).map(i => (i.toLong, vocabPosText, true)) ++
        (400 until 430).map(i => (i.toLong, vocabNegText, false)))
      .toDF("doc_id", "text", "is_pos")
    val row = QualityClassifier.evaluateHashed(
        vocabPos, vocabNeg, evalDf, "doc_id", "text", "is_pos")
      .collect()(0)
    val Seq(n, tp, fp, fn, tn, p6, r6, a6) =
      (0 until 8).map(row.getLong(_))
    assert((n, tp, fp, fn, tn) == ((50L, 20L, 0L, 0L, 30L)))
    assert((p6, r6, a6) == ((1000000L, 1000000L, 1000000L)))
    // an imperfect split exercises the floor-division arithmetic: flip
    // some labels so the confusion is mixed but still deterministic
    val flipped = ((300 until 320).map(i => (i.toLong, vocabPosText, i >= 315)) ++
        (400 until 430).map(i => (i.toLong, vocabNegText, i < 410)))
      .toDF("doc_id", "text", "is_pos")
    val r2 = QualityClassifier.evaluateHashed(
        vocabPos, vocabNeg, flipped, "doc_id", "text", "is_pos").collect()(0)
    val (n2, tp2, fp2, fn2, tn2) =
      (r2.getLong(0), r2.getLong(1), r2.getLong(2), r2.getLong(3), r2.getLong(4))
    assert(n2 == tp2 + fp2 + fn2 + tn2)
    assert((tp2, fp2, fn2, tn2) == ((5L, 15L, 10L, 20L)))
    assert(r2.getLong(5) == 5L * 1000000L / 20L)   // precision tp/(tp+fp)
    assert(r2.getLong(6) == 5L * 1000000L / 15L)   // recall tp/(tp+fn)
    assert(r2.getLong(7) == 25L * 1000000L / 50L)  // accuracy
  }

  test("distributed q149 reproduces the straight-line eval mirror at sf0.001") {
    val docs = Tables(spark, sfDir, "documents")
      .selectExpr("cast(doc_id as long) as doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1).toIndexedSeq
    val want = QualityMirror.recomputeHashedEval(docs)
    assert(want._1 > 0L && want._1 == want._2 + want._3 + want._4 + want._5)
    val row = Queries.classifierEval(spark, sfDir).collect()(0)
    val got = (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
      row.getLong(4), row.getLong(5), row.getLong(6), row.getLong(7))
    assert(got == want)
  }
}
