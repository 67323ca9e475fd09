package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Bm25, Knn}

/** The loud serving-batch caps (the `Dedup.incrementalAssembled`
  * pattern, extended to the BM25 and IVF index probes): every
  * driver-side fold in a probe is bounded only by the one-retrieval-
  * batch contract, so an over-cap "batch" must fall back to a
  * fully-distributed plan — logged, never a driver OOM — and the
  * fallback must return IDENTICAL rows. */
class ServingCapSpec extends AnyFunSuite {
  import SparkSuiteBase.spark
  import spark.implicits._

  private val corpus: Seq[(Long, String)] = (0L until 60L).map { i =>
    (i, s"the common filler words and the rare${i % 7} token doc$i")
  }
  private val queries = Seq((1L, "the"), (1L, "rare3"), (2L, "rare5"),
    (3L, "doc11"))

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("bm25 topK: over-cap batch falls back to the distributed exact " +
      "path with identical rows") {
    val docs = corpus.toDF("doc_id", "text")
    val q = queries.toDF("qid", "term")
    val normal = rows(Bm25.topK(docs, "doc_id", "text", q, k = 5))
    val overCap = rows(Bm25.topK(docs, "doc_id", "text", q, k = 5,
      maxBatchPairs = 1L))
    assert(overCap == normal && normal.nonEmpty)
  }

  test("bm25 topKAgainstIndex: over-cap batch falls back to the " +
      "distributed full-scan path with identical rows (maxDf included)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cap_bm25").toString
    Bm25.buildIndex(corpus.toDF("doc_id", "text"), "doc_id", "text",
      "g_cap_spec_bm25", s"$dir/idx", nDirs = 4)
    val q = queries.toDF("qid", "term")
    val normal = rows(Bm25.topKAgainstIndex(q, "g_cap_spec_bm25", k = 60))
    val overCap = rows(Bm25.topKAgainstIndex(q, "g_cap_spec_bm25", k = 60,
      maxBatchPairs = 1L))
    assert(overCap == normal && normal.nonEmpty)
    // the lossy maxDf stopword prune must survive the fallback path too
    val normalMaxDf = rows(Bm25.topKAgainstIndex(q, "g_cap_spec_bm25",
      k = 60, maxDf = 10L))
    val overCapMaxDf = rows(Bm25.topKAgainstIndex(q, "g_cap_spec_bm25",
      k = 60, maxDf = 10L, maxBatchPairs = 1L))
    assert(overCapMaxDf == normalMaxDf && normalMaxDf != normal)
  }

  test("ivf ivfTopKAgainstIndex: over-cap batch skips the cell-pruning " +
      "collect and scans all cells with identical rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cap_ivf").toString
    val rnd = new scala.util.Random(11)
    val vecs = (0L until 40L).map { i =>
      (i, Seq((i % 4) * 10.0 + rnd.nextDouble(),
        (i % 4) * 10.0 + rnd.nextDouble(), 1.0))
    }
    Knn.writeIvfIndex(vecs.toDF("vec_id", "embedding"), "vec_id",
      "embedding", "g_cap_spec_ivf", s"$dir/idx", nCells = 4)
    val q = vecs.filter(_._1 < 5).toDF("vec_id", "embedding")
    def probe(cap: Long): Seq[(Long, Int, Long)] =
      Knn.ivfTopKAgainstIndex(q, "g_cap_spec_ivf", "vec_id", "embedding",
          k = 3, broadcastMaxQcells = cap)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .sortBy(t => (t._1, t._2)).toSeq
    val normal = probe(8000000L)
    val overCap = probe(0L)
    assert(overCap == normal && normal.nonEmpty)
  }
}
