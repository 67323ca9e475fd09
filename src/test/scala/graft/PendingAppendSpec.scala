package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame

import graft.operators.{Dedup, Knn}
import graft.sources.{Generations, PendingAppend, Snapshots}

/** Self-healing append crash recovery for the IVF and MinHash families
  * (r17 — the r16 verdict's top directive: transplant BM25's
  * pending-sidecar pattern so a crash between the staged file moves and
  * the snapshot record no longer silently truncates historical reads).
  * Each crash half must recover to BIT-EQUALITY with a clean append:
  *
  *  - before the commit marker → roll BACK (stages + sidecar deleted,
  *    index untouched, re-running the batch lands cleanly);
  *  - after the marker (nothing moved / everything moved but not
  *    recorded) → roll FORWARD (moves replayed idempotently, snapshot
  *    commit recorded so the add-file log sees the batch);
  *  - after recovery, `Snapshots.unrecordedFiles` is EMPTY — the crash
  *    window that used to leave the directory ahead of the log is
  *    closed — and recovery is idempotent (a second call is a no-op).
  */
class PendingAppendSpec extends AnyFunSuite {
  import SparkSuiteBase.spark
  import spark.implicits._

  /** 60 vectors in 3 well-separated clusters (4-dim), deterministic. */
  private def vecs: DataFrame = (0L until 60L).map { i =>
    val c = (i % 3).toInt
    val v = Array.fill(4)(0.0f)
    v(c) = 1.0f
    v(3) = i.toFloat / 100f
    (i, v.toSeq)
  }.toDF("vec_id", "embedding")

  private def knnRows(tbl: String, asOf: Int = 0): Seq[(Long, Int, Long, Double)] =
    Knn.ivfTopKAgainstIndex(vecs.filter($"vec_id" < 5), tbl,
        "vec_id", "embedding", k = 3, asOfCommits = asOf)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq

  private def sq8Rows(tbl: String): Seq[(Long, Int, Long)] =
    Knn.ivfTopKAgainstIndexSq8(vecs.filter($"vec_id" < 5), tbl,
        "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq

  private def ivfCrashCase(tag: String, crashAt: String,
      forward: Boolean): Unit = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_ivfcr_$tag").toString
    val tbl = s"g_ivfcr_$tag"
    val (evens, odds) =
      (vecs.filter($"vec_id" % 2 === 0), vecs.filter($"vec_id" % 2 === 1))
    Knn.writeIvfIndex(evens, "vec_id", "embedding", tbl, s"$dir/idx",
      nCells = 4)
    val atBuild = knnRows(tbl)
    PendingAppend.testCrashPoint = crashAt
    val e = intercept[RuntimeException] {
      Knn.appendToIvfIndex(odds, "vec_id", "embedding", tbl)
    }
    assert(e.getMessage.contains("simulated crash"))
    // the dead JVM's successor: ANY maintenance op (or the explicit
    // call) replays the decision from the sidecar + marker
    Knn.recoverPendingAppend(spark, tbl)
    if (!forward) {
      // rolled BACK: index untouched, nothing recorded, re-run lands
      assert(knnRows(tbl) == atBuild, "rollback must leave the index untouched")
      val ops = Snapshots.history(spark, tbl)
        .select("op").collect().map(_.getString(0)).toSeq
      assert(ops == Seq("build"), s"a rollback records nothing: $ops")
      Knn.appendToIvfIndex(odds, "vec_id", "embedding", tbl)
    } else {
      val ops = Snapshots.history(spark, tbl)
        .select("op").collect().map(_.getString(0)).toSeq
      assert(ops.contains("append-recovery"),
        s"roll-forward must be a recorded commit: $ops")
      // time travel ACROSS the recovered append serves the build state
      assert(knnRows(tbl, asOf = 1) == atBuild,
        "history must step back across the recovered append")
    }
    // either way the final state equals one clean build+append
    val ref = s"g_ivfcr_${tag}_ref"
    Knn.writeIvfIndex(evens, "vec_id", "embedding", ref, s"$dir/ref",
      nCells = 4)
    Knn.appendToIvfIndex(odds, "vec_id", "embedding", ref)
    assert(knnRows(tbl) == knnRows(ref),
      s"recovery after a $crashAt crash must equal a clean append")
    // the closed window: directory and file log agree
    assert(Snapshots.unrecordedFiles(spark, tbl, s"${tbl}_cells").isEmpty,
      "no file may be present in the directory but absent from the log")
    // idempotent: a second recovery is a no-op
    val histBefore = Snapshots.history(spark, tbl).count()
    Knn.recoverPendingAppend(spark, tbl)
    assert(Snapshots.history(spark, tbl).count() == histBefore)
  }

  test("IVF append crash BEFORE the commit marker rolls BACK: index " +
      "untouched, re-run equals a clean append (r17 directive 1)") {
    ivfCrashCase("intent", "pending.afterIntent", forward = false)
  }

  test("IVF append crash AFTER the marker, before any move, rolls " +
      "FORWARD to bit-equality with a clean append") {
    ivfCrashCase("marker", "pending.afterMarker", forward = true)
  }

  test("IVF append crash after the moves but before the snapshot " +
      "record rolls FORWARD with the commit recorded") {
    ivfCrashCase("move", "pending.afterMove", forward = true)
  }

  test("IVF append crash recovery covers the SQ8 replica: both members " +
      "roll forward as one batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfcr_q8").toString
    val tbl = "g_ivfcr_q8"
    val (evens, odds) =
      (vecs.filter($"vec_id" % 2 === 0), vecs.filter($"vec_id" % 2 === 1))
    Knn.writeIvfIndex(evens, "vec_id", "embedding", tbl, s"$dir/idx",
      nCells = 4)
    Knn.quantizeIvfIndex(spark, tbl)
    PendingAppend.testCrashPoint = "pending.afterMarker"
    intercept[RuntimeException] {
      Knn.appendToIvfIndex(odds, "vec_id", "embedding", tbl)
    }
    Knn.recoverPendingAppend(spark, tbl)
    val ref = "g_ivfcr_q8_ref"
    Knn.writeIvfIndex(evens, "vec_id", "embedding", ref, s"$dir/ref",
      nCells = 4)
    Knn.quantizeIvfIndex(spark, ref)
    Knn.appendToIvfIndex(odds, "vec_id", "embedding", ref)
    assert(knnRows(tbl) == knnRows(ref))
    assert(sq8Rows(tbl) == sq8Rows(ref),
      "the SQ8 replica's staged batch must roll forward with the cells")
    assert(Snapshots.unrecordedFiles(spark, tbl, s"${tbl}_cells").isEmpty)
    assert(Snapshots.unrecordedFiles(spark, tbl, s"${tbl}_cells_q8").isEmpty)
  }

  // ----------------------------------------------------------- minhash

  private def doc(i: Long) =
    s"minhash corpus sentence number $i with shared filler words"

  private def mhStatuses(tbl: String, ids: Seq[Long]): Map[Long, String] =
    Dedup.minhashIncrementalAgainstIndex(
        ids.map(i => (i + 5000L, doc(i))).toDF("doc_id", "text"),
        tbl, "doc_id", "text")
      .select($"doc_id", $"status").collect()
      .map(r => (r.getLong(0) - 5000L, r.getString(1))).toMap

  private def mhCrashCase(tag: String, crashAt: String,
      forward: Boolean): Unit = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_mhcr_$tag").toString
    val tbl = s"g_mhcr_$tag"
    val hist = (0L until 20L).map(i => (i, doc(i)))
    val batch = (100L until 110L).map(i => (i, doc(i)))
    Dedup.writeMinhashIndex(hist.toDF("doc_id", "text"), "doc_id", "text",
      tbl, s"$dir/idx", numBuckets = 4)
    PendingAppend.testCrashPoint = crashAt
    val e = intercept[RuntimeException] {
      Dedup.ingestAgainstIndex(batch.toDF("doc_id", "text"), tbl,
        "doc_id", "text").collect()
    }
    assert(e.getMessage.contains("simulated crash"))
    Dedup.recoverPendingAppend(spark, tbl)
    if (!forward) {
      // rolled BACK: the batch left no trace — replays of its docs
      // match only when the batch is re-ingested
      assert(mhStatuses(tbl, batch.map(_._1)).values.forall(_ == "new"),
        "rollback must leave the history without the batch")
      val ops = Snapshots.history(spark, tbl)
        .select("op").collect().map(_.getString(0)).toSeq
      assert(ops == Seq("build"), s"a rollback records nothing: $ops")
      Dedup.ingestAgainstIndex(batch.toDF("doc_id", "text"), tbl,
        "doc_id", "text").collect()
    } else {
      val ops = Snapshots.history(spark, tbl)
        .select("op").collect().map(_.getString(0)).toSeq
      assert(ops.contains("append-recovery"),
        s"roll-forward must be a recorded commit: $ops")
    }
    // the grown history classifies replays of BOTH halves as dups,
    // exactly like a clean build+ingest
    val ref = s"g_mhcr_${tag}_ref"
    Dedup.writeMinhashIndex(hist.toDF("doc_id", "text"), "doc_id", "text",
      ref, s"$dir/ref", numBuckets = 4)
    Dedup.ingestAgainstIndex(batch.toDF("doc_id", "text"), ref,
      "doc_id", "text").collect()
    val ids = hist.map(_._1) ++ batch.map(_._1)
    assert(mhStatuses(tbl, ids) == mhStatuses(ref, ids),
      s"recovery after a $crashAt crash must equal a clean ingest")
    assert(Snapshots.unrecordedFiles(spark, tbl, s"${tbl}_sigs").isEmpty)
    assert(Snapshots.unrecordedFiles(spark, tbl, s"${tbl}_buckets").isEmpty)
    val histBefore = Snapshots.history(spark, tbl).count()
    Dedup.recoverPendingAppend(spark, tbl)
    assert(Snapshots.history(spark, tbl).count() == histBefore)
  }

  test("MinHash ingest crash BEFORE the commit marker rolls BACK and " +
      "the re-run equals a clean ingest") {
    mhCrashCase("intent", "pending.afterIntent", forward = false)
  }

  test("MinHash ingest crash AFTER the marker rolls FORWARD: both " +
      "bucketed tables complete, snapshot recorded") {
    mhCrashCase("marker", "pending.afterMarker", forward = true)
  }

  test("recovery sweeps orphan stage directories (a crash during the " +
      "staged write, before any sidecar)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfcr_orph").toString
    val tbl = "g_ivfcr_orph"
    Knn.writeIvfIndex(vecs, "vec_id", "embedding", tbl, s"$dir/idx",
      nCells = 4)
    val parent = new org.apache.hadoop.fs.Path(
      Generations.basePath(spark, s"${tbl}_cells")).getParent
    val fs = parent.getFileSystem(spark.sessionState.newHadoopConf())
    val orphan = new org.apache.hadoop.fs.Path(parent, "cells__stagedeadbeef")
    fs.mkdirs(new org.apache.hadoop.fs.Path(orphan, "cell=0"))
    val before = knnRows(tbl)
    Knn.recoverPendingAppend(spark, tbl)
    assert(!fs.exists(orphan), "the orphan stage must be reclaimed")
    assert(knnRows(tbl) == before, "the live index is untouched")
  }
}
