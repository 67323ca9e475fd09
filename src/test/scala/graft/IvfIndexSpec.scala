package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec

import graft.operators.Knn

/** Contract battery for the PERSISTED IVF index (q158,
  * `Knn.writeIvfIndex` + `ivfTopKAgainstIndex`): the index probe must
  * rank bit-identically to the in-session `ivfTopK` on the same corpus
  * (identical quantizer training, assignment, and scoring trees), and
  * the probe's scan of the cells table must carry a partition filter on
  * `cell` — the planning-time directory prune that bounds per-call cost
  * to the probed cells instead of the corpus. */
class IvfIndexSpec extends AnyFunSuite {
  import SparkSuiteBase.spark
  import spark.implicits._

  /** 60 vectors in 3 well-separated clusters (4-dim), deterministic. */
  private def corpus: DataFrame = (0L until 60L).map { i =>
    val c = (i % 3).toInt
    val v = Array.fill(4)(0.0f)
    v(c) = 1.0f
    v(3) = i.toFloat / 100f
    (i, v.toSeq)
  }.toDF("vec_id", "embedding")

  private def collectRows(df: DataFrame): Seq[(Long, Int, Long, Double)] =
    df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq

  private lazy val indexDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfidx_spec").toString
    Knn.writeIvfIndex(corpus, "vec_id", "embedding",
      "g_ivfidx_spec", s"$dir/idx", nCells = 4)
    dir
  }

  test("index probe == in-session ivfTopK row-for-row") {
    indexDir
    val queries = corpus.filter($"vec_id" < 5)
    val viaIndex = collectRows(Knn.ivfTopKAgainstIndex(
      queries, "g_ivfidx_spec", "vec_id", "embedding", k = 3))
    val inSession = collectRows(Knn.ivfTopK(
      corpus, queries, "vec_id", "embedding", k = 3, nCells = 4))
    assert(viaIndex.nonEmpty && viaIndex == inSession)
  }

  test("appendToIvfIndex: build-half + append-half == the mirror's " +
      "train-on-evens contract; centroids untouched; every id once") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfapp_spec").toString
    Knn.writeIvfIndex(corpus.filter($"vec_id" % 2 === 0), "vec_id",
      "embedding", "g_ivfapp_spec", s"$dir/idx", nCells = 4)
    val centroidsBefore = spark.table("g_ivfapp_spec_centroids")
      .orderBy($"cell").collect().map(_.getSeq[Double](1)).toSeq
    Knn.appendToIvfIndex(corpus.filter($"vec_id" % 2 === 1), "vec_id",
      "embedding", "g_ivfapp_spec")
    // append never retrains: the centroid table is byte-identical
    val centroidsAfter = spark.table("g_ivfapp_spec_centroids")
      .orderBy($"cell").collect().map(_.getSeq[Double](1)).toSeq
    assert(centroidsAfter == centroidsBefore)
    // the grown cell table holds every id exactly once
    val ids = spark.table("g_ivfapp_spec_cells").select($"id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == (0L until 60L))
    // probe of the grown index == IvfMirror under the same contract
    // (quantizer from evens, assignment/scoring over all) — the q160
    // oracle's unit-level twin
    val vecs = corpus.collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1).toIndexedSeq
    val expected = IvfMirror.recompute(vecs, maxQid = 5L, k = 3,
      nCells = 4, trainFilter = _ % 2 == 0)
      .sortBy(t => (t._1, t._2))
    val got = collectRows(Knn.ivfTopKAgainstIndex(
      corpus.filter($"vec_id" < 5), "g_ivfapp_spec",
      "vec_id", "embedding", k = 3))
    assert(got.nonEmpty && got == expected)
  }

  test("probe scan prunes on the cell partition column") {
    indexDir
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Knn.ivfTopKAgainstIndex(
          corpus.filter($"vec_id" === 0L), "g_ivfidx_spec",
          "vec_id", "embedding", k = 3, nProbe = 1)
        .queryExecution.executedPlan
      val cellScans = plan.collect {
        case s: FileSourceScanExec if s.tableIdentifier.exists(
          _.table == "g_ivfidx_spec_cells") => s
      }
      assert(cellScans.nonEmpty, "plan must scan the cells table")
      assert(cellScans.forall(_.partitionFilters.nonEmpty),
        "cells scan must carry a cell partition filter (directory pruning)")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
