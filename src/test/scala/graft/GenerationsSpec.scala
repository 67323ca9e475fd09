package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Bm25, Dedup, Knn}
import graft.sources.Generations

/** The probe-during-maintenance contract of the [[Generations]] live
  * views, for all three index families (BM25, MinHash, IVF):
  *
  *  1. a probe interleaved between EVERY maintenance step (build →
  *     probe → append/ingest → probe → compact → probe) returns the
  *     rows the maintenance semantics promise at that point;
  *  2. a probe frame PLANNED before a compaction still COLLECTS
  *     correctly after it — the superseded generation (files and
  *     registration) is retained until the next maintenance commit;
  *  3. the flip is one atomic catalog op: probes hammering the live
  *     name from another thread WHILE a compaction runs never observe
  *     a missing or half-swapped table (the old DROP+RENAME pair had a
  *     window in which `spark.table(live)` threw
  *     TABLE_OR_VIEW_NOT_FOUND).
  */
class GenerationsSpec extends AnyFunSuite {
  import SparkSuiteBase.spark
  import spark.implicits._

  // ---------------------------------------------------------------- BM25

  private val corpus: Seq[(Long, String)] = (0L until 60L).map { i =>
    (i, s"the common filler words and the rare${i % 7} token doc$i")
  }
  private val bmQueries = Seq((1L, "the"), (1L, "rare3"), (2L, "rare5"))

  private def bmRows(table: String): Seq[(Long, Long, Long, Long)] =
    Bm25.topKAgainstIndex(bmQueries.toDF("qid", "term"), table, k = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("BM25: probe between every maintenance step; pre-planned probe " +
      "survives the compaction flip (retention)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gen_bm25").toString
    val tbl = "g_gen_spec_bm25"
    // build → probe
    Bm25.buildIndex(corpus.filter(_._1 % 2 == 0).toDF("doc_id", "text"),
      "doc_id", "text", tbl, s"$dir/idx", nDirs = 4)
    val half = bmRows(tbl)
    assert(half.nonEmpty)
    // append → probe (must now see the full corpus)
    Bm25.appendToIndex(corpus.filter(_._1 % 2 == 1).toDF("doc_id", "text"),
      "doc_id", "text", tbl)
    val full = bmRows(tbl)
    assert(full != half, "append must change the ranking frame")
    // plan a probe BEFORE compaction, collect it AFTER: the superseded
    // generation is retained, so the pre-planned frame still reads
    val planned = Bm25.topKAgainstIndex(bmQueries.toDF("qid", "term"), tbl, k = 60)
    Bm25.compactIndex(spark, tbl)
    val prePlanned = planned.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(prePlanned == full,
      "probe planned before the compaction must still collect the same rows")
    // probe re-derived after the flip reads the new generation — equal rows
    assert(bmRows(tbl) == full)
    // the live names are views carrying the generation pointer
    assert(Generations.current(spark, s"${tbl}_postings").contains("__g"))
    assert(Generations.current(spark, s"${tbl}_dfs").contains("__g"))
  }

  test("BM25: concurrent probes during a compaction never observe a " +
      "missing or half-swapped table") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gen_conc").toString
    val tbl = "g_gen_spec_conc"
    Bm25.buildIndex(corpus.toDF("doc_id", "text"), "doc_id", "text",
      tbl, s"$dir/idx", nDirs = 4)
    val expected = bmRows(tbl)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val probed = new java.util.concurrent.atomic.AtomicInteger(0)
    val hammer = new Thread(() => {
      while (!stop.get()) {
        try {
          assert(bmRows(tbl) == expected)
          probed.incrementAndGet()
        } catch { case t: Throwable => failures.add(t); stop.set(true) }
      }
    })
    hammer.start()
    try {
      // ONE compaction while probes hammer: the superseded generation is
      // retained, so every concurrently-planned probe reads a complete
      // generation whichever side of the atomic flip it resolves on
      Bm25.compactIndex(spark, tbl)
      // let a few post-flip probes through
      val deadline = System.nanoTime() + 3000000000L
      while (probed.get() < 3 && System.nanoTime() < deadline && !stop.get())
        Thread.sleep(20)
    } finally { stop.set(true); hammer.join(30000) }
    assert(failures.isEmpty,
      s"concurrent probe failed during compaction: ${failures.peek()}")
    assert(probed.get() >= 1, "hammer thread never completed a probe")
    assert(bmRows(tbl) == expected)
  }

  // -------------------------------------------------------------- MinHash

  private def words(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$prefix$i")

  test("MinHash: probe between build → ingest → compact → ingest; " +
      "pre-planned probe survives the flip") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gen_mh").toString
    val tbl = "g_gen_spec_mh"
    val base = words("h", 50).mkString(" ")
    Dedup.writeMinhashIndex(Seq(0L -> base).toDF("doc_id", "text"),
      "doc_id", "text", tbl, s"$dir/idx", numBuckets = 4)
    def probe(id: Long, text: String): (String, Long) = {
      val r = Dedup.minhashIncrementalAgainstIndex(
        Seq(id -> text).toDF("doc_id", "text"), tbl, "doc_id", "text")
        .collect()(0)
      (r.getString(1), r.getLong(2))
    }
    assert(probe(10L, base) == ("dup_history", 1L))
    assert(probe(11L, words("z", 50).mkString(" ")) == ("new", 0L))
    // ingest grows history
    Dedup.ingestAgainstIndex(Seq(1L -> words("p", 50).mkString(" "))
      .toDF("doc_id", "text"), tbl, "doc_id", "text").collect()
    assert(probe(12L, words("p", 50).mkString(" ")) == ("dup_history", 1L))
    // plan a probe, compact, collect the pre-planned frame
    val planned = Dedup.minhashIncrementalAgainstIndex(
      Seq(13L -> base).toDF("doc_id", "text"), tbl, "doc_id", "text")
    Dedup.compactMinhashIndex(spark, tbl)
    val r = planned.collect()(0)
    assert((r.getString(1), r.getLong(2)) == ("dup_history", 1L),
      "probe planned before the compaction must still classify correctly")
    // the compacted index still probes and still grows
    assert(probe(14L, base) == ("dup_history", 1L))
    Dedup.ingestAgainstIndex(Seq(2L -> words("q", 50).mkString(" "))
      .toDF("doc_id", "text"), tbl, "doc_id", "text").collect()
    assert(probe(15L, words("q", 50).mkString(" ")) == ("dup_history", 1L))
  }

  // ------------------------------------------------------------------ IVF

  test("IVF: probe between build → append → compact → rebuild; " +
      "pre-planned probe survives the flip") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gen_ivf").toString
    val tbl = "g_gen_spec_ivf"
    val rnd = new scala.util.Random(7)
    def vec(c: Int): Seq[Double] =
      Seq(c * 10.0 + rnd.nextDouble(), c * 10.0 + rnd.nextDouble(), 1.0)
    val base = (0L until 40L).map(i => (i, vec((i % 4).toInt)))
    Knn.writeIvfIndex(base.toDF("vec_id", "embedding"),
      "vec_id", "embedding", tbl, s"$dir/idx", nCells = 4)
    def probe(): Seq[(Long, Int, Long)] =
      Knn.ivfTopKAgainstIndex(base.filter(_._1 < 3).toDF("vec_id", "embedding"),
          tbl, "vec_id", "embedding", k = 2)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .sortBy(t => (t._1, t._2)).toSeq
    val p0 = probe()
    assert(p0.nonEmpty)
    Knn.appendToIvfIndex((40L until 60L).map(i => (i, vec((i % 4).toInt)))
      .toDF("vec_id", "embedding"), "vec_id", "embedding", tbl)
    val p1 = probe()
    // plan, compact, collect pre-planned
    val planned = Knn.ivfTopKAgainstIndex(
      base.filter(_._1 < 3).toDF("vec_id", "embedding"),
      tbl, "vec_id", "embedding", k = 2)
    Knn.compactIvfIndex(spark, tbl)
    val prePlanned = planned.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(prePlanned == p1,
      "probe planned before the compaction must still collect the same rows")
    assert(probe() == p1)
    // rebuild flips BOTH tables (centroids then cells) — probe after
    Knn.rebuildIvfIndex(spark, tbl, nCells = 4)
    assert(probe().nonEmpty)
  }

  // ------------------------------------------------------------- vacuum

  test("vacuum reclaims every generation except the live one; probes " +
      "re-derived afterwards still work") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gen_vac").toString
    val tbl = "g_gen_spec_vac"
    Bm25.buildIndex(corpus.toDF("doc_id", "text"), "doc_id", "text",
      tbl, s"$dir/idx", nDirs = 4)
    val expected = bmRows(tbl)
    Bm25.compactIndex(spark, tbl)
    // retention holds the superseded build generation...
    assert(new java.io.File(s"$dir/idx/postings").exists())
    Generations.vacuum(spark, s"${tbl}_postings")
    Generations.vacuum(spark, s"${tbl}_dfs")
    // ...until vacuum reclaims it early (the Delta VACUUM shape)
    assert(!new java.io.File(s"$dir/idx/postings").exists(),
      "vacuum must delete superseded generations")
    assert(new java.io.File(s"$dir/idx/postings__g1").exists(),
      "vacuum must keep the live generation")
    assert(bmRows(tbl) == expected)
  }

  test("familyOf maps every member suffix — the snapshot FILE log " +
      "included — onto the index family, so vacuum and compactLog " +
      "contend on the same lock (r15 ADVICE)") {
    assert(Generations.familyOf("idx_postings") == "idx")
    assert(Generations.familyOf("idx_log") == "idx")
    // pre-fix, "_logfiles" was missing and the file-log table locked
    // ITSELF — a vacuum could retire compactLog's in-flight reservation
    assert(Generations.familyOf("idx_logfiles") == "idx")
    assert(Generations.familyOf("idx_cells_q8") == "idx")
    assert(Generations.familyOf("idx_cells") == "idx")
    assert(Generations.familyOf("plain_table") == "plain_table")
  }
}
