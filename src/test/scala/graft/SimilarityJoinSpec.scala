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
