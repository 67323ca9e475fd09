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

  test("short doc yields exactly one short chunk; empty/null text ZERO chunks") {
    assert(run("a b", 32, 24) == Seq((0L, 1L, 2L, "a b")))
    // round-11 contract fix: 0 tokens in → 0 chunks out (previously the
    // split(trim('')) artifact emitted one chunk of one empty token)
    assert(run(null, 32, 24).isEmpty)
    assert(run("", 32, 24).isEmpty)
    assert(run("   ", 32, 24).isEmpty)
  }

  test("strideChunksOf chunks arbitrary arrays with the same algebra") {
    val df = Seq(
      (1L, Seq(10, 20, 30, 40, 50, 60, 70)),
      (2L, Seq.empty[Int])).toDF("doc_id", "ids")
    val got = Chunker.strideChunksOf(df, "doc_id", "ids", 4, 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getSeq[Int](4).toSeq))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got == Seq(
      (1L, 0L, 1L, 4L, Seq(10, 20, 30, 40)),
      (1L, 1L, 3L, 4L, Seq(30, 40, 50, 60)),
      (1L, 2L, 5L, 3L, Seq(50, 60, 70))))
  }

  test("strideChunkDigest equals the md5 chain recomputed from the explode path") {
    val df = Seq(
      (1L, (1 to 103).map(_ * 7).toSeq),
      (2L, Seq(5, 6)),
      (3L, Seq.empty[Int])).toDF("doc_id", "ids")
    val digest = Chunker.strideChunkDigest(df, "doc_id", "ids", 32, 24)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1).toSeq
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val exploded = Chunker.strideChunksOf(df, "doc_id", "ids", 32, 24)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Int](4).mkString(",")))
      .groupBy(_._1)
    val want = Seq(1L, 2L, 3L).map { id =>
      val chunks = exploded.getOrElse(id, Array.empty).sortBy(_._2)
      val n = df.collect().find(_.getLong(0) == id).get.getSeq[Int](1).size.toLong
      (id, n, chunks.length.toLong, md5hex(chunks.map(c => md5hex(c._3)).mkString("|")))
    }
    assert(digest == want)
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
