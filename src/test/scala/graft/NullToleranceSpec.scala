package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Real corpora contain NULL and empty documents; every corpus operator
  * must treat them as degenerate rows (drop or pass through), never crash
  * — a single NPE at row 10^9 kills a 100 TB job.
  */
class NullToleranceSpec extends AnyFunSuite {
  import SparkSuiteBase.spark

  private def hostile = {
    import spark.implicits._
    Seq(
      (1L, "normal document with several words here"),
      (2L, null.asInstanceOf[String]),
      (3L, ""),
      (4L, "   "),
      (5L, "x")
    ).toDF("id", "text")
  }

  test("dedup operators tolerate null/empty/whitespace documents") {
    assert(operators.Dedup.exact(hostile, "id", Seq("text")).count() >= 3)
    assert(operators.Dedup.minhashCandidatePairs(hostile, "id", "text").count() >= 0)
    assert(operators.Dedup.simhashCandidatePairs(hostile, "id", "text", 3).count() >= 0)
    assert(operators.Dedup.fuzzyClusters(hostile, "id", "text", 0.9).count() == 5)
  }

  test("corpus filters tolerate null/empty/whitespace documents") {
    assert(operators.CorpusFilters.gopherRules(hostile, "id", "text").count() == 5)
    assert(operators.CorpusFilters.chunkDedup(hostile, "id", "text", 3).count() == 5)
  }

  test("round-7 operators tolerate null/empty/whitespace documents") {
    import spark.implicits._
    // substring dedup: every row survives; null text propagates as null
    // stats (null in, null out — matching the oracle's len(NULL)), empty
    // and whitespace docs are zero-token identities.
    val sub = operators.SubstringDedup.dedupSpans(hostile, "id", "text", k = 2)
    assert(sub.count() == 5)
    assert(sub.filter($"doc_id" === 2L).head().isNullAt(1)) // n_tokens null
    assert(sub.filter($"doc_id" === 3L).head().getLong(1) == 0L)
    // bigram LM: null/short docs score (0, 0), never crash
    val lm = operators.NgramLM.bigramNll(hostile, "id", "text")
    assert(lm.count() == 5)
    assert(lm.filter($"doc_id" === 2L).head().getLong(2) == 0L)
    // incremental dedup: null and whitespace-only text both normalize to
    // zero tokens and key as md5("") — so both incoming degenerates (id 2
    // null, id 4 whitespace) dedup against the empty-text history doc
    // (id 3) rather than crashing or vanishing
    val out = operators.Dedup.incremental(
      hostile.filter($"id" % 2 === 0), hostile.filter($"id" % 2 === 1),
      "id", "text").collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out == Map(2L -> "dup_history", 4L -> "dup_history"))
  }

  test("text analysis Columns and UDFs tolerate null/empty/whitespace") {
    val out = hostile.select(
      functions.TextAnalysis.qualityScore(col("text")).as("q"),
      functions.TextAnalysis.tokenCountWs(col("text")).as("tws"),
      functions.TextAnalysis.tokenCountRegex(col("text")).as("tre"))
    assert(out.count() == 5)
    assert(functions.TextAnalysis.detectLang(null) != null ||
      functions.TextAnalysis.detectLang(null) == null) // must not throw
    functions.TextAnalysis.fingerprint64("")           // must not throw
    assert(functions.TextAnalysis.normalizeText("") == "")
  }

  test("sampling tolerates null grouping keys") {
    import spark.implicits._
    val dom = hostile.withColumn("dom",
      when($"id" <= 2, lit(null: String)).otherwise(lit("d")))
    assert(operators.Sampling.capPerGroup(dom, "dom", "id", 2).count() >= 3)
  }

  test("standardize_title tolerates null/empty input") {
    val out = hostile.select(
      functions.GraftFunctions.standardize_title(col("text")).as("std"))
    assert(out.count() == 5)
  }
}
