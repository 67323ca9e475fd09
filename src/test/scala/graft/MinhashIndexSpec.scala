package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

import graft.operators.Dedup

/** Contract battery for the PERSISTED MinHash history index (q154,
  * `Dedup.writeMinhashIndex` + `minhashIncrementalAgainstIndex`): the
  * index probe must classify bit-identically to the stateless
  * `minhashIncremental` on the same corpus (planted + randomized), the
  * broadcast→shuffle batch fallback must be a pure distribution change,
  * and the physical plan must never shuffle full-history rows — every
  * exchange above an index scan sits above the candidate-bounding
  * broadcast join. */
class MinhashIndexSpec extends AnyFunSuite {
  import SparkSuiteBase.spark
  import spark.implicits._

  private def words(group: String, n: Int): IndexedSeq[String] =
    (0 until n).map(i => s"${group}w$i")
  private def variant(group: String, base: IndexedSeq[String], subs: Seq[Int]): String =
    subs.foldLeft(base) { (ws, i) => ws.updated(i, s"${group}x$i") }.mkString(" ")

  private def buildIndex(history: Seq[(Long, String)], table: String): Unit = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_$table").toString
    Dedup.writeMinhashIndex(history.toDF("doc_id", "text"),
      "doc_id", "text", table, s"$dir/idx", numBuckets = 4)
  }

  private def collectRows(df: DataFrame): Seq[(Long, String, Long)] =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq

  test("index probe == stateless form on planted classifications") {
    val a = words("a", 50); val c = words("c", 50)
    val history = Seq(
      0L -> a.mkString(" "),
      2L -> words("h", 50).mkString(" "))
    val incoming = Seq(
      1L -> variant("a", a, Seq(25)),     // near-dup of history doc 0
      3L -> a.mkString(" "),              // exact copy of history doc 0
      5L -> c.mkString(" "),              // first of an in-batch pair
      7L -> variant("c", c, Seq(10)),     // near-dup of incoming doc 5
      9L -> words("f", 50).mkString(" ")) // fresh
    buildIndex(history, "g_mhidx_spec_planted")
    val viaIndex = collectRows(Dedup.minhashIncrementalAgainstIndex(
      incoming.toDF("doc_id", "text"), "g_mhidx_spec_planted", "doc_id", "text"))
    val stateless = collectRows(Dedup.minhashIncremental(
      incoming.toDF("doc_id", "text"), history.toDF("doc_id", "text"),
      "doc_id", "text"))
    assert(viaIndex == stateless)
    assert(viaIndex == Seq(
      (1L, "dup_history", 1L), (3L, "dup_history", 1L),
      (5L, "new", 0L), (7L, "dup_batch", 0L), (9L, "new", 0L)))
  }

  test("index probe == stateless form on a randomized 400-doc corpus; " +
      "shuffle fallback (broadcastMaxBatchDocs=0) identical") {
    val rnd = new scala.util.Random(7)
    val all = (0L until 400L).map { i =>
      val seed = if (i % 100 < 10) i - (i % 20) else i
      val base = (0 until 30).map(k => s"t${seed}_${k}")
      val ws = if (seed != i && i % 2 == 1)
        base.updated(rnd.nextInt(30), s"z$i") else base
      i -> ws.mkString(" ")
    }
    val incoming = all.filter(_._1 % 2 == 1)
    val history = all.filter(_._1 % 2 == 0)
    buildIndex(history, "g_mhidx_spec_rand")
    val viaIndex = collectRows(Dedup.minhashIncrementalAgainstIndex(
      incoming.toDF("doc_id", "text"), "g_mhidx_spec_rand", "doc_id", "text"))
    assert(viaIndex == collectRows(Dedup.minhashIncremental(
      incoming.toDF("doc_id", "text"), history.toDF("doc_id", "text"),
      "doc_id", "text")))
    assert(viaIndex.exists(_._2 == "dup_history"), "corpus must plant history dups")
    // above-bound batches fall back to shuffle joins: same rows exactly
    val viaShuffle = collectRows(Dedup.minhashIncrementalAgainstIndex(
      incoming.toDF("doc_id", "text"), "g_mhidx_spec_rand", "doc_id", "text",
      broadcastMaxBatchDocs = 0L))
    assert(viaShuffle == viaIndex)
  }

  test("ingest loop: batch 2 classifies against history GROWN by batch 1; " +
      "appends preserve the bucket spec") {
    val a = words("a", 50)
    val history = Seq(0L -> words("h", 50).mkString(" "))
    val batch1 = Seq(
      1L -> a.mkString(" "),              // new today...
      4L -> words("p", 50).mkString(" "))
    val batch2 = Seq(
      2L -> variant("a", a, Seq(25)),     // ...and batch 2 must see it as history
      5L -> words("q", 50).mkString(" "))
    buildIndex(history, "g_mhidx_spec_ingest")
    val r1 = collectRows(Dedup.ingestAgainstIndex(
      batch1.toDF("doc_id", "text"), "g_mhidx_spec_ingest", "doc_id", "text"))
    assert(r1 == DedupGolden.recomputeIncrementalFor(batch1, history))
    val r2 = collectRows(Dedup.ingestAgainstIndex(
      batch2.toDF("doc_id", "text"), "g_mhidx_spec_ingest", "doc_id", "text"))
    assert(r2 == DedupGolden.recomputeIncrementalFor(batch2, history ++ batch1))
    // the load-bearing row: a cross-batch dup no single stateless probe sees
    assert(r2.head == (2L, "dup_history", 1L))
    // the appended tables keep their declared layout — the probe's
    // exchange-free history side survives growth
    for ((tbl, keys) <- Seq("g_mhidx_spec_ingest_sigs" -> Seq("id"),
        "g_mhidx_spec_ingest_buckets" -> Seq("band", "bh"))) {
      // the live name is a Generations view — the bucket spec lives on
      // the current generation table
      val meta = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(
          graft.sources.Generations.current(spark, tbl)))
      assert(meta.bucketSpec.exists(s =>
        s.numBuckets == 4 && s.bucketColumnNames == keys))
    }
  }

  test("compactMinhashIndex: multi-file buckets collapse to one file per " +
      "bucket; classification identical; bucket spec survives the swap") {
    val a = words("a", 50)
    buildIndex(Seq(0L -> words("h", 50).mkString(" ")), "g_mhidx_spec_cpt")
    Dedup.ingestAgainstIndex(Seq(1L -> a.mkString(" ")).toDF("doc_id", "text"),
      "g_mhidx_spec_cpt", "doc_id", "text").collect()
    Dedup.ingestAgainstIndex(
      Seq(4L -> words("p", 50).mkString(" ")).toDF("doc_id", "text"),
      "g_mhidx_spec_cpt", "doc_id", "text").collect()
    def partFiles(table: String): Seq[String] = {
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
    // one bucket-file set per write (build + 2 ingests) — compaction's
    // reason to exist
    val sigsBefore = partFiles("g_mhidx_spec_cpt_sigs").size
    assert(sigsBefore >= 3, s"expected >= 3 sig files pre-compaction, got $sigsBefore")
    val batch3 = Seq(
      2L -> variant("a", a, Seq(25)), // near-dup of batch-1 doc 1
      5L -> words("q", 50).mkString(" "))
    val pre = collectRows(Dedup.minhashIncrementalAgainstIndex(
      batch3.toDF("doc_id", "text"), "g_mhidx_spec_cpt", "doc_id", "text"))
    Dedup.compactMinhashIndex(spark, "g_mhidx_spec_cpt")
    for (tbl <- Seq("g_mhidx_spec_cpt_sigs", "g_mhidx_spec_cpt_buckets")) {
      val files = partFiles(tbl)
      assert(files.size <= 4, // numBuckets = 4; empty buckets write no file
        s"$tbl should hold at most one file per bucket post-compaction, " +
          s"got ${files.size}")
      assert(graft.sources.Generations.location(spark, tbl).endsWith("__g1"))
      // the swap preserves the bucket spec — the probe's exchange-free
      // history side survives compaction like it survives appends
      val meta = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(
          graft.sources.Generations.current(spark, tbl)))
      assert(meta.bucketSpec.exists(_.numBuckets == 4))
    }
    val post = collectRows(Dedup.minhashIncrementalAgainstIndex(
      batch3.toDF("doc_id", "text"), "g_mhidx_spec_cpt", "doc_id", "text"))
    assert(post == pre && post.head == (2L, "dup_history", 1L))
    // and the compacted index still grows: ingest after compaction
    val r3 = collectRows(Dedup.ingestAgainstIndex(
      batch3.toDF("doc_id", "text"), "g_mhidx_spec_cpt", "doc_id", "text"))
    assert(r3 == pre)
  }

  test("plan pin: no exchange carries full-history index rows — every " +
      "shuffle above an index scan sits above the broadcast join") {
    val history = (0L until 50L).map(i => i -> s"hist doc $i xxxxx")
    val incoming = (0L until 9L).map(i => (2 * i + 1) -> s"batch doc $i")
    buildIndex(history, "g_mhidx_spec_plan")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val (assembled, incSigs) = Dedup.incrementalAssembled(
        incoming.toDF("doc_id", "text"),
        spark.table("g_mhidx_spec_plan_sigs"),
        spark.table("g_mhidx_spec_plan_buckets"),
        "doc_id", "text", 3, 64, 16, 0.8, 2000000L)
      val plan = assembled.queryExecution.executedPlan
      def indexScan(p: SparkPlan): Boolean = p.collect {
        case s: FileSourceScanExec
          if s.relation.location.rootPaths.exists(
            _.toString.contains("g_mhidx_spec_plan")) => s
      }.nonEmpty
      val offenders = plan.collect {
        case ex: ShuffleExchangeExec if indexScan(ex) &&
          ex.collect { case b: BroadcastHashJoinExec => b }.isEmpty => ex
      }
      assert(offenders.isEmpty,
        s"full-history rows crossed an exchange un-bounded by the " +
          s"broadcast candidate join:\n${offenders.mkString("\n")}")
      // and the index IS read through broadcast joins, not re-signatured:
      // no ScalaUDF may apply to the history side (batch side only)
      assert(indexScan(plan), "plan must actually scan the index tables")
      incSigs.unpersist()
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
