package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Ingestion-time incremental dedup: history probe, within-batch
  * first-wins, normalization of the content key, and the
  * exact-join-algebra partitioning invariance. */
class IncrementalDedupSpec extends AnyFunSuite {
  import SparkSuiteBase.spark

  test("classifies new / dup_history / dup_batch") {
    import spark.implicits._
    val history = Seq(
      0L -> "alpha beta gamma",
      2L -> "delta epsilon").toDF("doc_id", "text")
    val incoming = Seq(
      1L -> "alpha beta gamma",  // in history -> dup_history
      3L -> "zeta eta",          // fresh -> new
      5L -> "zeta eta",          // repeats doc 3 -> dup_batch
      7L -> "theta iota",        // fresh -> new
      9L -> "  Alpha   BETA gamma ").toDF("doc_id", "text")
      // ^ same normalized content as history doc 0 -> dup_history
    val out = Dedup.incremental(incoming, history, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out == Map(
      1L -> "dup_history", 3L -> "new", 5L -> "dup_batch",
      7L -> "new", 9L -> "dup_history"))
  }

  test("dup_history wins over dup_batch when both apply") {
    import spark.implicits._
    val history = Seq(0L -> "k1").toDF("doc_id", "text")
    val incoming = Seq(1L -> "k1", 3L -> "k1").toDF("doc_id", "text")
    val out = Dedup.incremental(incoming, history, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out == Map(1L -> "dup_history", 3L -> "dup_history"))
  }

  test("result is partitioning-invariant") {
    import spark.implicits._
    val hist = (0L until 30L).map(i => i -> s"h${i % 10}")
    val inc = (100L until 160L).map(i => i -> s"h${i % 25}")
    val a = Dedup.incremental(
      inc.toDF("doc_id", "text"), hist.toDF("doc_id", "text"),
      "doc_id", "text").orderBy("doc_id").collect().toSeq
    val b = Dedup.incremental(
      inc.toDF("doc_id", "text").repartition(7, $"doc_id" % 3),
      hist.toDF("doc_id", "text").repartition(5, $"text"),
      "doc_id", "text").orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}
