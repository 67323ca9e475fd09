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
}
