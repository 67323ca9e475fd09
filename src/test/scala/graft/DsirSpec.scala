package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Dsir

/** Contract battery for DSIR importance resampling (q139): weight
  * direction, exact e4 arithmetic vs the straight-line mirror,
  * partitioning-invariance (the determinism contract), null tolerance,
  * and the distributed-vs-mirror cross-check on the live sf0.001 corpus. */
class DsirSpec extends AnyFunSuite {
  import SparkSuiteBase.{spark, sfDir}
  import spark.implicits._

  // target speaks vocabulary A; the raw pool mixes A-speakers and
  // B-speakers with long docs so log-weight gaps dwarf Gumbel noise
  private val aText = "alpha beta gamma delta epsilon " * 12
  private val bText = "zebra yak xylo walrus vulture " * 12
  private def targetDf = (0 until 6).map(i => (1000L + i, aText, "en")).toDF("doc_id", "text", "lang")
  private def rawDf = ((0 until 10).map(i => (i.toLong, aText, "xx")) ++
    (10 until 20).map(i => (i.toLong, bText, "xx"))).toDF("doc_id", "text", "lang")

  test("weights separate target-like from off-target docs") {
    val w = Dsir.importanceWeights(rawDf, targetDf, "doc_id", "text", buckets = 512)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(w.size == 20)
    val aW = (0L until 10L).map(w)
    val bW = (10L until 20L).map(w)
    assert(aW.min > bW.max,
      s"every A-speaker must outweigh every B-speaker: ${aW.min} vs ${bW.max}")
    // identical text ⇒ identical weight (content-determined, not id-determined)
    assert(aW.distinct.size == 1 && bW.distinct.size == 1)
  }

  test("resampleTopK selects the target-like docs under planted separation") {
    val top = Dsir.resampleTopK(rawDf, targetDf, "doc_id", "text", k = 10, buckets = 512)
      .collect()
    assert(top.length == 10)
    assert(top.map(_.getInt(0)).toSeq == (1 to 10))
    // weight gap >> Gumbel spread ⇒ exactly the 10 A-speakers win
    assert(top.map(_.getLong(1)).toSet == (0L until 10L).toSet)
  }

  test("n_feats counts unigrams + bigrams; null/empty text scores (0, 0)") {
    val raw = Seq((1L, "one two three"), (2L, ""), (3L, null.asInstanceOf[String]),
      (4L, "solo")).toDF("doc_id", "text")
    val w = Dsir.importanceWeights(raw, Seq((9L, "one two")).toDF("doc_id", "text"),
        "doc_id", "text", buckets = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(w.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(w(0)._2 == 5, "3 unigrams + 2 bigrams")
    assert(w(1) == ((2L, 0L, 0L)) && w(2) == ((3L, 0L, 0L)), "degenerate docs keep weight 1 (log 0)")
    assert(w(3)._2 == 1, "single token has no bigram")
  }

  test("output is invariant to input partitioning (determinism contract)") {
    val base = Dsir.resampleTopK(rawDf, targetDf, "doc_id", "text", k = 15, buckets = 512)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    val repart = Dsir.resampleTopK(rawDf.repartition(13), targetDf.repartition(7),
        "doc_id", "text", k = 15, buckets = 512)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(base == repart)
  }

  test("distributed q139 reproduces the straight-line mirror at sf0.001") {
    val docs = Tables(spark, sfDir, "documents")
      .selectExpr("cast(doc_id as long) as doc_id", "text", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1).toIndexedSeq
    val want = DsirMirror.recompute(docs)
    assert(want.nonEmpty && want.map(_._1) == (1 to want.size))
    val got = Queries.dsirResample(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == want)
  }

  test("importanceKeys and resampleTopK agree (the corpus-scale cutoff path)") {
    val keys = Dsir.importanceKeys(rawDf, targetDf, "doc_id", "text", buckets = 512)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(4))).toMap
    val top = Dsir.resampleTopK(rawDf, targetDf, "doc_id", "text", k = 20, buckets = 512)
      .collect()
    assert(keys.size == 20 && top.length == 20)
    top.foreach { r =>
      val (logw, key) = keys(r.getLong(1))
      assert(r.getLong(3) == logw && r.getLong(4) == key)
    }
    // the top-k by key over the full key set equals resampleTopK's pick
    val wantOrder = keys.toSeq.sortBy { case (id, (_, key)) => (-key, id) }.map(_._1)
    assert(top.sortBy(_.getInt(0)).map(_.getLong(1)).toSeq == wantOrder)
  }

  test("empty target corpus degrades to a defined uniform-ish draw (no NPE/throw)") {
    // tTot = 0: λ_b = ln(1/B) − ln((c_r+1)/(r_tot+B)) is still defined
    // for every bucket, weights are finite, and selection is pure Gumbel
    val noTarget = targetDf.filter($"doc_id" < 0)
    val out = Dsir.resampleTopK(rawDf, noTarget, "doc_id", "text", k = 5, buckets = 512)
      .collect()
    assert(out.length == 5)
    assert(out.forall(r => r.getLong(3) != 0L), "weights should be computed, not zeroed")
  }

  test("argument validation") {
    intercept[IllegalArgumentException] {
      Dsir.resampleTopK(rawDf, targetDf, "doc_id", "text", k = 0)
    }
    intercept[IllegalArgumentException] {
      Dsir.importanceWeights(rawDf, targetDf, "doc_id", "text", buckets = 1)
    }
  }
}
