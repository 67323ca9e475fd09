package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, TitleStandardizer}
import graft.operators.SimilarityJoin

/** The DataFrame-native inverted-index join must reproduce the per-row
  * UDF's argmax on real data — same winner, same tie-breaks, same all-OOV
  * fallback. */
class SimilarityJoinSpec extends AnyFunSuite {
  import SparkSuiteBase.{spark, sfDir}

  test("standardizeViaJoin agrees with the UDF on sf0.001 documents") {
    import spark.implicits._
    val docs = Tables(spark, sfDir, "documents")
      .withColumn("title", substring($"text", 1, 40))
      .select($"doc_id", $"title")
      .cache()

    val viaJoin = SimilarityJoin.standardizeViaJoin(docs, "doc_id", "title")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    val viaUdf = docs.collect()
      .map(r => r.getLong(0) -> TitleStandardizer.standardize(r.getString(1))).toMap

    assert(viaJoin.keySet == viaUdf.keySet)
    val diffs = viaUdf.collect {
      case (id, want) if viaJoin(id) != want => s"$id: join=${viaJoin(id)} udf=$want"
    }
    assert(diffs.isEmpty, s"\n${diffs.take(10).mkString("\n")}")
    docs.unpersist()
  }

  test("all-OOV and empty inputs fall back to corpus[0] via the join path") {
    import spark.implicits._
    val df = Seq((1L, "qqqzzz xxyy"), (2L, ""), (3L, "1234 !!")).toDF("id", "title")
    val out = SimilarityJoin.standardizeViaJoin(df, "id", "title")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // "1234 !!" tokenizes to "1234" which may be in-vocab; the truly empty
    // ones must hit the reference fallback alias (corpus index 0)
    assert(out(1L) == "General Worker - All Occupations")
    assert(out(2L) == "General Worker - All Occupations")
    assert(out(3L) == TitleStandardizer.standardize("1234 !!"))
  }

  test("topKAgainst (fully distributed TF-IDF) reproduces the dictionary path") {
    import spark.implicits._
    import graft.dict.TitleDictionary
    val docs = Tables(spark, sfDir, "documents")
      .withColumn("title", substring($"text", 1, 40))
      .select($"doc_id", $"title")
      .limit(120)
      .cache()
    val corpusDf = TitleDictionary.corpus.zipWithIndex
      .map { case (alias, i) => (i.toLong, alias) }.toSeq
      .toDF("alias_id", "alias")

    val generic = SimilarityJoin.topKAgainst(
      docs, "doc_id", "title", corpusDf, "alias_id", "alias", k = 1,
      maxDf = Double.PositiveInfinity)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("alias_id"), r.getAs[Double]("score"))).toMap
    val viaDict = SimilarityJoin.topK(docs, "doc_id", "title", k = 1)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("match_doc_id").toLong, r.getAs[Double]("score"))).toMap

    // OOV rows fall back to doc 0 only in the dictionary path (generic has
    // no fallback contract); compare on matched rows
    val common = generic.keySet & viaDict.keySet
    assert(common.nonEmpty)
    val disagreements = common.toSeq.filter { id =>
      generic(id)._1 != viaDict(id)._1 &&
        math.abs(generic(id)._2 - viaDict(id)._2) > 1e-9
    }
    assert(disagreements.isEmpty,
      s"material disagreements (not float-tie artifacts): ${disagreements.take(5)}")
    docs.unpersist()
  }

  test("thresholdJoin (prefix-filtered) finds every exact match above tau") {
    import spark.implicits._
    import graft.dict.TitleDictionary
    val tau = 0.4
    val docs = Tables(spark, sfDir, "documents")
      .withColumn("title", substring($"text", 1, 40))
      .select($"doc_id", $"title")
      .limit(150)
      .cache()
    val corpusDf = TitleDictionary.corpus.zipWithIndex
      .map { case (alias, i) => (i.toLong, alias) }.toSeq
      .toDF("alias_id", "alias")

    val exact = SimilarityJoin.topKAgainst(
      docs, "doc_id", "title", corpusDf, "alias_id", "alias", k = 1,
      maxDf = Double.PositiveInfinity)
      .filter($"score" >= tau)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("alias_id"), r.getAs[Double]("score"))).toMap
    val pruned = SimilarityJoin.thresholdJoin(
      docs, "doc_id", "title", corpusDf, "alias_id", "alias", k = 1, minScore = tau)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("alias_id"), r.getAs[Double]("score"))).toMap

    assert(exact.nonEmpty, "test needs some matches above tau")
    // losslessness: every exact above-threshold match survives pruning with
    // the same winner (scores may differ in final ulps — different
    // accumulation order)
    exact.foreach { case (id, (alias, score)) =>
      assert(pruned.contains(id), s"doc $id lost by prefix filtering")
      val (pAlias, pScore) = pruned(id)
      assert(pAlias == alias || math.abs(pScore - score) < 1e-9,
        s"doc $id: pruned winner $pAlias/$pScore vs exact $alias/$score")
    }
    docs.unpersist()
  }

  test("topK returns k ranked matches with lowest-index tie-breaks") {
    import spark.implicits._
    val df = Seq((1L, "software engineer")).toDF("id", "title")
    val top3 = SimilarityJoin.topK(df, "id", "title", k = 3)
      .orderBy($"rnk").collect()
    assert(top3.length == 3)
    assert(top3.map(_.getAs[Int]("rnk")).toSeq == Seq(1, 2, 3))
    val scores = top3.map(_.getAs[Double]("score"))
    assert(scores.sameElements(scores.sorted.reverse), "scores must be descending")
    assert(top3.head.getAs[String]("alias") == TitleStandardizer.matchAlias("software engineer"))
  }
}
