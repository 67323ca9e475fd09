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

  private def partFiles(spark: org.apache.spark.sql.SparkSession,
      table: String): Seq[String] = {
    val loc = graft.sources.Generations.location(spark, table)
    val p = new org.apache.hadoop.fs.Path(loc)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val it = fs.listFiles(p, true)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val f = it.next().getPath.toString
      if (f.contains("part-")) out += f
    }
    out.toSeq
  }

  test("compactIvfIndex: appends leave multiple files per touched cell, " +
      "compaction leaves one; probe row-identical; location moves a generation") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfcpt_spec").toString
    Knn.writeIvfIndex(corpus.filter($"vec_id" % 2 === 0), "vec_id",
      "embedding", "g_ivfcpt_spec", s"$dir/idx", nCells = 4)
    Knn.appendToIvfIndex(corpus.filter($"vec_id" % 2 === 1), "vec_id",
      "embedding", "g_ivfcpt_spec")
    def filesPerCell: Map[String, Int] = partFiles(spark, "g_ivfcpt_spec_cells")
      .groupBy(f => f.replaceAll(".*/(cell=\\d+)/.*", "$1")).map { case (c, fs) => (c, fs.size) }
    val before = filesPerCell
    assert(before.values.exists(_ >= 2),
      s"append should add a file per touched cell dir, got $before")
    val queries = corpus.filter($"vec_id" < 5)
    val preProbe = collectRows(Knn.ivfTopKAgainstIndex(
      queries, "g_ivfcpt_spec", "vec_id", "embedding", k = 3))
    Knn.compactIvfIndex(spark, "g_ivfcpt_spec")
    val after = filesPerCell
    assert(after.nonEmpty && after.values.forall(_ == 1),
      s"compaction must leave exactly one file per cell dir, got $after")
    assert(graft.sources.Generations.location(spark, "g_ivfcpt_spec_cells")
      .endsWith("__g1"))
    val postProbe = collectRows(Knn.ivfTopKAgainstIndex(
      queries, "g_ivfcpt_spec", "vec_id", "embedding", k = 3))
    assert(postProbe.nonEmpty && postProbe == preProbe)
  }

  test("rebuildIvfIndex after appends == fresh writeIvfIndex over the " +
      "whole corpus, bit-for-bit (centroids and ranking)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfrb_spec").toString
    Knn.writeIvfIndex(corpus.filter($"vec_id" % 2 === 0), "vec_id",
      "embedding", "g_ivfrb_spec", s"$dir/idx", nCells = 4)
    Knn.appendToIvfIndex(corpus.filter($"vec_id" % 2 === 1), "vec_id",
      "embedding", "g_ivfrb_spec")
    Knn.rebuildIvfIndex(spark, "g_ivfrb_spec", nCells = 4)
    Knn.writeIvfIndex(corpus, "vec_id", "embedding",
      "g_ivfrb_spec_fresh", s"$dir/fresh", nCells = 4)
    val rebuilt = spark.table("g_ivfrb_spec_centroids")
      .orderBy($"cell").collect().map(r => (r.getInt(0), r.getSeq[Double](1))).toSeq
    val fresh = spark.table("g_ivfrb_spec_fresh_centroids")
      .orderBy($"cell").collect().map(r => (r.getInt(0), r.getSeq[Double](1))).toSeq
    assert(rebuilt == fresh, "retraining from the index must equal a fresh build")
    val queries = corpus.filter($"vec_id" < 5)
    val viaRebuilt = collectRows(Knn.ivfTopKAgainstIndex(
      queries, "g_ivfrb_spec", "vec_id", "embedding", k = 3))
    val viaFresh = collectRows(Knn.ivfTopKAgainstIndex(
      queries, "g_ivfrb_spec_fresh", "vec_id", "embedding", k = 3))
    assert(viaRebuilt.nonEmpty && viaRebuilt == viaFresh)
  }

  test("ivfCellStats: a skewed append stream raises cell occupancy; " +
      "rebuild restores balance") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfst_spec").toString
    Knn.writeIvfIndex(corpus, "vec_id", "embedding",
      "g_ivfst_spec", s"$dir/idx", nCells = 4)
    def stats: Map[Int, (Long, Double)] = Knn.ivfCellStats(spark, "g_ivfst_spec")
      .collect().map(r => (r.getInt(0), (r.getLong(1), r.getDouble(2)))).toMap
    val before = stats
    assert(before.values.map(_._1).sum == 60L)
    // drift: 120 new vectors all near one cluster direction pile into
    // the same frozen cell
    val skewed = (100L until 220L).map { i =>
      val v = Array.fill(4)(0.0f); v(0) = 1.0f; v(3) = (i % 7).toFloat / 100f
      (i, v.toSeq)
    }.toDF("vec_id", "embedding")
    Knn.appendToIvfIndex(skewed, "vec_id", "embedding", "g_ivfst_spec")
    val after = stats
    assert(after.values.map(_._1).sum == 180L)
    assert(after.values.map(_._2).max > before.values.map(_._2).max,
      s"skewed appends must raise max occupancy: $before -> $after")
    Knn.rebuildIvfIndex(spark, "g_ivfst_spec", nCells = 4)
    val rebuilt = stats
    assert(rebuilt.values.map(_._2).max < after.values.map(_._2).max,
      s"rebuild must rebalance cells: $after -> $rebuilt")
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
        // the live name is a Generations view; the physical scan carries
        // the generation table's identifier (g_ivfidx_spec_cells__gN)
        case s: FileSourceScanExec if s.tableIdentifier.exists(
          _.table.startsWith("g_ivfidx_spec_cells")) => s
      }
      assert(cellScans.nonEmpty, "plan must scan the cells table")
      assert(cellScans.forall(_.partitionFilters.nonEmpty),
        "cells scan must carry a cell partition filter (directory pruning)")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
