package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Chunker

/** Contract battery for sliding-window chunking (q146): hand-computed
  * window boundaries (overlap, exact-fit, short-doc, clamped tail),
  * full-coverage invariant, and argument/null edges. */
class ChunkerSpec extends AnyFunSuite {
  import SparkSuiteBase.spark
  import spark.implicits._

  private def run(text: String, len: Int, stride: Int) =
    Chunker.strideChunks(
        Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", len, stride)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .sortBy(_._1).toSeq

  test("hand-computed overlapping windows with clamped tail") {
    // 7 tokens, len 4, stride 2 → lastChunk = ((7-4)+1) div 2 = 2:
    // chunks [1..4], [3..6], [5..7] (tail clamped to 3 tokens)
    val got = run("a b c d e f g", 4, 2)
    assert(got == Seq(
      (0L, 1L, 4L, "a b c d"),
      (1L, 3L, 4L, "c d e f"),
      (2L, 5L, 3L, "e f g")))
  }

  test("stride == len gives non-overlapping exact cover") {
    val got = run("a b c d e f", 3, 3)
    assert(got == Seq((0L, 1L, 3L, "a b c"), (1L, 4L, 3L, "d e f")))
  }

  test("short doc yields exactly one short chunk; null text one empty-ish chunk") {
    assert(run("a b", 32, 24) == Seq((0L, 1L, 2L, "a b")))
    // null → coalesce("") → split gives a single empty token (the q64
    // whitespace-token contract — DuckDB string_split_regex agrees)
    val got = run(null, 32, 24)
    assert(got == Seq((0L, 1L, 1L, "")))
  }

  test("every token is covered and offsets follow the stride") {
    val text = (1 to 103).map(i => s"t$i").mkString(" ")
    val got = run(text, 32, 24)
    // lastChunk = ((103-32)+23) div 24 = 3 → 4 chunks
    assert(got.map(_._1) == Seq(0L, 1L, 2L, 3L))
    assert(got.map(_._2) == Seq(1L, 25L, 49L, 73L))
    assert(got.map(_._3) == Seq(32L, 32L, 32L, 31L))
    // coverage: last chunk reaches token 103
    assert(got.last._2 + got.last._3 - 1 == 103L)
  }

  test("argument validation") {
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Chunker.strideChunks(df, "doc_id", "text", chunkLen = 0, stride = 1)
    }
    intercept[IllegalArgumentException] {
      Chunker.strideChunks(df, "doc_id", "text", chunkLen = 4, stride = 5)
    }
  }
}
