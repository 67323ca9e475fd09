package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bm25, Dedup, Knn}
import graft.sources.{Generations, Snapshots}

/** Auto-compaction cadence (r15 verdict directive 6): the append/ingest
  * loops of all three index families accept `autoCompactAfter = N` and
  * trigger their family's compaction once the snapshot log counts N
  * appends since the last base manifest — the adds-since-base count IS
  * the probe's files-per-directory growth (each append adds ~one file
  * per touched directory), read from the log alone with no FS walk.
  * Pinned here:
  *  - the compaction FIRES at the threshold (a `compact` commit appears
  *    in the history without being asked for) and the cadence repeats;
  *  - files per directory stay within the fresh-index band across many
  *    appends (the 10M-vector smoke measured grown probes at 3× fresh
  *    after 5 un-compacted appends — this is the guardrail);
  *  - results are IDENTICAL to an un-compacted twin (compaction is pure
  *    layout maintenance).
  */
class AutoCompactSpec extends AnyFunSuite {
  import SparkSuiteBase.spark
  import spark.implicits._

  private def filesPerDir(table: String): Map[String, Int] = {
    val root = new org.apache.hadoop.fs.Path(
      Generations.location(spark, Generations.current(spark, table)))
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(root)
      .filter(s => s.isDirectory && !s.getPath.getName.startsWith("_"))
      .map { d =>
        d.getPath.getName -> fs.listStatus(d.getPath)
          .count(f => f.isFile && !f.getPath.getName.startsWith("_") &&
            !f.getPath.getName.startsWith("."))
      }.toMap
  }

  test("IVF appends auto-compact at the threshold: bounded files per " +
      "cell, compact commits in the history, probe identical to the " +
      "un-compacted twin") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ac_ivf").toString
    val vecs = (0L until 120L).map(i =>
      (i, Array.tabulate(8)(d => math.sin(i * 13 + d * 5).toFloat).toSeq))
    def batches = (1 to 5).map(b =>
      vecs.filter(v => v._1 >= b * 20 && v._1 < (b + 1) * 20))
    def build(tbl: String, d: String, after: Int): Unit = {
      Knn.writeIvfIndex(vecs.filter(_._1 < 20).toDF("vec_id", "embedding"),
        "vec_id", "embedding", tbl, s"$d/idx", nCells = 4)
      batches.foreach(b => Knn.appendToIvfIndex(b.toDF("vec_id", "embedding"),
        "vec_id", "embedding", tbl, autoCompactAfter = after))
    }
    build("g_ac_ivf", s"$dir/a", after = 2)
    build("g_ac_ivf_twin", s"$dir/b", after = 0)
    // cadence fired: compact commits appear in the history unprompted
    val ops = Snapshots.history(spark, "g_ac_ivf")
      .select("op").collect().map(_.getString(0)).toSeq
    assert(ops.count(_ == "compact") == 2,
      s"5 appends at autoCompactAfter=2 must compact twice: $ops")
    // the files-per-cell growth stays in the fresh band (compaction
    // rewrites to 1 file per cell; at most `after` appends ride on top)
    val fpd = filesPerDir("g_ac_ivf_cells")
    assert(fpd.nonEmpty && fpd.values.max <= 3,
      s"files per cell must stay within 1 + autoCompactAfter: $fpd")
    val fpdTwin = filesPerDir("g_ac_ivf_twin_cells")
    assert(fpdTwin.values.max > 3,
      s"twin sanity: un-compacted cells must have accumulated files: $fpdTwin")
    // and the probe is bit-identical to the un-compacted twin
    def probe(tbl: String) = Knn.ivfTopKAgainstIndex(
        vecs.filter(_._1 < 5).toDF("vec_id", "embedding"), tbl,
        "vec_id", "embedding", k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(probe("g_ac_ivf") == probe("g_ac_ivf_twin"))
  }

  test("BM25 appends auto-compact at the threshold; ranking identical " +
      "to the un-compacted twin") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ac_bm").toString
    val docs = (0L until 120L).map(i =>
      (i, s"shared filler rare${i % 6} token doc$i"))
    def batches = (1 to 4).map(b =>
      docs.filter(d => d._1 >= b * 24 && d._1 < (b + 1) * 24))
    Bm25.buildIndex(docs.filter(_._1 < 24).toDF("doc_id", "text"),
      "doc_id", "text", "g_ac_bm", s"$dir/a/idx", nDirs = 4)
    batches.foreach(b => Bm25.appendToIndex(b.toDF("doc_id", "text"),
      "doc_id", "text", "g_ac_bm", autoCompactAfter = 2))
    Bm25.buildIndex(docs.filter(_._1 < 24).toDF("doc_id", "text"),
      "doc_id", "text", "g_ac_bm_twin", s"$dir/b/idx", nDirs = 4)
    batches.foreach(b => Bm25.appendToIndex(b.toDF("doc_id", "text"),
      "doc_id", "text", "g_ac_bm_twin"))
    val ops = Snapshots.history(spark, "g_ac_bm")
      .select("op").collect().map(_.getString(0)).toSeq
    assert(ops.count(_ == "compact") == 2,
      s"4 appends at autoCompactAfter=2 must compact twice: $ops")
    val fpd = filesPerDir("g_ac_bm_postings")
    assert(fpd.nonEmpty && fpd.values.max <= 3,
      s"files per tb dir must stay within 1 + autoCompactAfter: $fpd")
    def probe(tbl: String) = Bm25.topKAgainstIndex(
        Seq((1L, "rare3"), (2L, "filler")).toDF("qid", "term"), tbl, k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(probe("g_ac_bm") == probe("g_ac_bm_twin"))
  }

  test("MinHash ingests auto-compact at the threshold; classification " +
      "identical to the un-compacted twin") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ac_mh").toString
    def doc(i: Long) = s"history document number $i with common filler"
    val hist = (0L until 30L).map(i => (i, doc(i)))
    def batches = (1 to 3).map(b =>
      (0L until 10L).map(i => (1000L * b + i, doc(i * b))))
    def runLoop(tbl: String, d: String, after: Int): Seq[Seq[(Long, String, Long)]] = {
      Dedup.writeMinhashIndex(hist.toDF("doc_id", "text"), "doc_id", "text",
        tbl, s"$d/idx", numBuckets = 4)
      batches.map(b => Dedup.ingestAgainstIndex(b.toDF("doc_id", "text"),
          tbl, "doc_id", "text", autoCompactAfter = after)
        .select($"doc_id", $"status", $"n_hist_dups").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .sortBy(_._1).toSeq)
    }
    val got = runLoop("g_ac_mh", s"$dir/a", after = 2)
    val want = runLoop("g_ac_mh_twin", s"$dir/b", after = 0)
    assert(got == want,
      "auto-compaction must not change any batch's classification")
    val ops = Snapshots.history(spark, "g_ac_mh")
      .select("op").collect().map(_.getString(0)).toSeq
    assert(ops.contains("compact"),
      s"the cadence must have fired at least once: $ops")
  }
}
