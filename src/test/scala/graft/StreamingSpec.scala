package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.{UserEvent, UserTotals}

class StreamingSpec extends AnyFunSuite {
  import SparkSuiteBase.spark

  test("stateless standardize over a stream matches the batch goldens") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[String]
    val out = StreamingOps.standardizeStream(in.toDF().withColumnRenamed("value", "title"))
    val q = out.writeStream.format("memory").queryName("std_stream").outputMode("append").start()
    in.addData("robotics engineer", "poet")
    q.processAllAvailable()
    val got = spark.table("std_stream").collect()
      .map(r => r.getAs[String]("title") -> r.getAs[String]("std")).toMap
    q.stop()
    assert(got("robotics engineer") == "Robotics Engineer - Engineers, All Other")
    assert(got("poet") == "Poet - Writers and Authors")
  }

  test("watermarked tumbling-window counts aggregate per window") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = in.toDF().toDF("ts", "event_type", "value")
    val out = StreamingOps.windowedEventCounts(events, "1 hour", "10 minutes")
    val q = out.writeStream.format("memory").queryName("win_stream")
      .outputMode("update").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    in.addData(
      (t("2024-01-01 10:05:00"), "click", 1.0),
      (t("2024-01-01 10:55:00"), "click", 2.0),
      (t("2024-01-01 11:05:00"), "click", 4.0))
    q.processAllAvailable()
    val rows = spark.table("win_stream")
      .select(col("window.start").cast("string"), col("n"), col("sum_value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    q.stop()
    assert(rows.contains(("2024-01-01 10:00:00", 2L, 3.0)))
    assert(rows.contains(("2024-01-01 11:00:00", 1L, 4.0)))
  }

  test("sliding windows: each event lands in len/slide overlapping windows") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = in.toDF().toDF("ts", "event_type", "value")
    val out = StreamingOps.slidingEventCounts(events, "1 hour", "30 minutes")
    val q = out.writeStream.format("memory").queryName("slide_stream")
      .outputMode("update").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    in.addData((t("2024-01-01 10:05:00"), "click", 1.0))
    q.processAllAvailable()
    val rows = spark.table("slide_stream")
      .select(col("window.start").cast("string"), col("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    q.stop()
    // 10:05 is covered by the 09:30 and 10:00 windows — and only those
    assert(rows == Set(("2024-01-01 09:30:00", 1L), ("2024-01-01 10:00:00", 1L)))
  }

  test("watermarked dedup keeps the first delivery of a redelivered event") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val events = in.toDF().toDF("event_id", "ts", "payload")
    val out = StreamingOps.dedupWithinWatermark(events, Seq("event_id"), "10 minutes")
    val q = out.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // duplicate in the same batch AND redelivered in a later batch
    in.addData((1L, t("2024-01-01 10:00:00"), "first"),
               (1L, t("2024-01-01 10:00:01"), "dup-same-batch"),
               (2L, t("2024-01-01 10:00:02"), "other"))
    q.processAllAvailable()
    in.addData((1L, t("2024-01-01 10:03:00"), "dup-next-batch"))
    q.processAllAvailable()
    val rows = spark.table("dedup_stream")
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    q.stop()
    assert(rows == Set((1L, "first"), (2L, "other")))
  }

  test("stream-stream interval join buffers state only inside the window") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val imps = MemoryStream[(String, java.sql.Timestamp)]
    val clicks = MemoryStream[(String, java.sql.Timestamp)]
    val out = StreamingOps.intervalJoin(
      imps.toDF().toDF("key", "ts"),
      clicks.toDF().toDF("key", "ts"), "10 minutes", "10 minutes")
    val q = out.writeStream.format("memory").queryName("ij_stream")
      .outputMode("append").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    imps.addData(("ad1", t("2024-01-01 10:00:00")), ("ad2", t("2024-01-01 10:00:00")))
    clicks.addData(
      ("ad1", t("2024-01-01 10:04:00")), // inside the window → joins
      ("ad2", t("2024-01-01 10:20:00")), // past the window → dropped
      ("ad3", t("2024-01-01 10:05:00"))) // no impression → dropped
    q.processAllAvailable()
    val rows = spark.table("ij_stream")
      .select(col("key"), col("r_ts").cast("string"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    q.stop()
    assert(rows == Set(("ad1", "2024-01-01 10:04:00")))
  }

  test("file-source stream: readStream over parquet drives the windowed agg") {
    import spark.implicits._
    val dir = "/tmp/graft-stream-src"
    // stage the events table as a micros-timestamp parquet directory
    val batch = Tables(spark, SparkSuiteBase.sfDir, "events")
      .select($"ts", $"event_type", $"value")
    batch.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(batch.schema).parquet(dir)
    val out = StreamingOps.windowedEventCounts(stream, "1 hour", "10 minutes")
    val q = out.writeStream.format("memory").queryName("file_stream")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    // append mode only emits closed windows; compare the emitted subset
    // against the batch aggregation
    val streamed = spark.table("file_stream")
      .select(col("window.start").cast("long").as("w"), col("event_type"), col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val batchAgg = batch
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("long").as("w"), col("event_type"), col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed.nonEmpty, "watermark should have closed most historical windows")
    streamed.foreach { case (k, n) => assert(batchAgg(k) == n, s"window $k mismatch") }
  }

  test("checkpointed file sink recovers exactly-once across a restart") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val (src, sink, ckpt) = (s"$root/src", s"$root/sink", s"$root/ckpt")
    def startQuery() = spark.readStream
      .schema("event_id BIGINT, payload STRING").parquet(src)
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .outputMode("append").start()

    Seq((1L, "a"), (2L, "b")).toDF("event_id", "payload")
      .write.mode("append").parquet(src)
    val q1 = startQuery()
    q1.processAllAvailable(); q1.stop()

    // new input lands while the query is DOWN; the restarted query must
    // pick up exactly the unprocessed files from the checkpointed offsets
    Seq((3L, "c")).toDF("event_id", "payload")
      .write.mode("append").parquet(src)
    val q2 = startQuery()
    q2.processAllAvailable(); q2.stop()

    val got = spark.read.parquet(sink)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // exactly once: no replays of batch 1, no loss of the offline batch
    assert(got.sorted == Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("late data beyond the watermark is dropped from closed windows") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = in.toDF().toDF("ts", "event_type", "value")
    val out = StreamingOps.windowedEventCounts(events, "1 hour", "10 minutes")
    val q = out.writeStream.format("memory").queryName("late_stream")
      .outputMode("append").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // batch 1: populate 10:00 window; advance event time far enough that
    // the watermark (max ts - 10 min) passes the end of the 10:00 window
    in.addData((t("2024-01-01 10:05:00"), "click", 1.0))
    q.processAllAvailable()
    in.addData((t("2024-01-01 12:00:00"), "click", 1.0))
    q.processAllAvailable()
    // batch 3: a LATE event for the (closed) 10:00 window — must be dropped
    in.addData((t("2024-01-01 10:30:00"), "click", 99.0))
    q.processAllAvailable()
    in.addData((t("2024-01-01 14:00:00"), "click", 1.0)) // close 12:00 too
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("late_stream")
      .select(col("window.start").cast("string"), col("n"), col("sum_value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val w10 = rows.filter(_._1 == "2024-01-01 10:00:00").toSeq
    assert(w10 == Seq(("2024-01-01 10:00:00", 1L, 1.0)),
      s"late 10:30 event must not reopen the closed 10:00 window: ${w10.toSeq}")
  }

  test("flatMapGroupsWithState sessionizes by gap across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import graft.streaming.StreamingOps.{ClosedSession, SessionEvent}
    val in = MemoryStream[SessionEvent]
    val out = StreamingOps.sessionize(in.toDS(), gapMinutes = 30)
    val q = out.writeStream.format("memory").queryName("sess_stream")
      .outputMode("append").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    in.addData(
      SessionEvent(1L, t("2024-01-01 10:00:00")),
      SessionEvent(1L, t("2024-01-01 10:10:00")))
    q.processAllAvailable()
    // second batch: within-gap extension, then a 2h jump closes the session
    in.addData(
      SessionEvent(1L, t("2024-01-01 10:20:00")),
      SessionEvent(1L, t("2024-01-01 12:30:00")))
    q.processAllAvailable()
    val sessions = spark.table("sess_stream").as[ClosedSession].collect()
    q.stop()
    assert(sessions.length == 1)
    val s = sessions.head
    assert(s.user_id == 1L && s.n_events == 3)
    assert(s.start_ts == t("2024-01-01 10:00:00") && s.end_ts == t("2024-01-01 10:20:00"))
  }

  test("mapGroupsWithState keeps running per-user totals across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[UserEvent]
    val out = StreamingOps.runningUserTotals(in.toDS())
    val q = out.writeStream.format("memory").queryName("state_stream")
      .outputMode("update").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    in.addData(UserEvent(1L, t("2024-01-01 00:00:00"), 10.0))
    q.processAllAvailable()
    in.addData(UserEvent(1L, t("2024-01-01 00:01:00"), 5.0),
      UserEvent(2L, t("2024-01-01 00:02:00"), 7.0))
    q.processAllAvailable()
    val last = spark.table("state_stream").as[UserTotals].collect()
      .groupBy(_.user_id).map { case (u, rs) => u -> rs.maxBy(_.n_events) }
    q.stop()
    assert(last(1L) == UserTotals(1L, 2L, 15.0))
    assert(last(2L) == UserTotals(2L, 1L, 7.0))
  }

  test("foreachBatch upsert snapshot keeps exactly the newest row per key") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_upsert_ck").toString
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = StreamingOps.upsertSnapshot(
      in.toDF().toDF("key", "ts", "payload"), dir, ckpt)
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    def snap() = StreamingOps.readSnapshot(spark, dir).collect()
      .map(r => r.getAs[Long]("key") -> r.getAs[String]("payload")).toMap

    in.addData((1L, t("2024-01-01 00:00:10"), "a1"),
               (2L, t("2024-01-01 00:00:10"), "b1"))
    q.processAllAvailable()
    assert(snap() == Map(1L -> "a1", 2L -> "b1"))

    // update (with an in-batch older duplicate), insert, and carry-through
    in.addData((1L, t("2024-01-01 00:00:30"), "a2"),
               (1L, t("2024-01-01 00:00:20"), "a-mid"),
               (3L, t("2024-01-01 00:00:10"), "c1"))
    q.processAllAvailable()
    assert(snap() == Map(1L -> "a2", 2L -> "b1", 3L -> "c1"))

    // a stale (older-ts) redelivery must NOT regress the snapshot
    in.addData((2L, t("2024-01-01 00:00:05"), "b-stale"))
    q.processAllAvailable()
    q.stop()
    assert(snap() == Map(1L -> "a2", 2L -> "b1", 3L -> "c1"))
    assert(StreamingOps.readSnapshot(spark, dir).count() == 3)
  }

  test("upsert equal-ts in-batch ties resolve deterministically across replays") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // Two same-key rows with IDENTICAL ts inside one batch have no
    // arrival order after a shuffle; the content-hash tiebreaker must
    // pick the SAME winner on every replay (at-least-once redelivery
    // must not silently diverge the snapshot). Run the whole pipeline
    // from scratch several times, varying input order, and require one
    // stable answer.
    val winners = (0 until 3).map { i =>
      implicit val sq = spark.sqlContext
      val dir = java.nio.file.Files.createTempDirectory(s"graft_upsert_tie$i").toString
      val ckpt = java.nio.file.Files.createTempDirectory(s"graft_upsert_tie_ck$i").toString
      val in = MemoryStream[(Long, java.sql.Timestamp, String)]
      val q = StreamingOps.upsertSnapshot(
        in.toDF().toDF("key", "ts", "payload"), dir, ckpt)
      val rows = Seq((7L, t("2024-01-01 00:00:10"), "tie-x"),
                     (7L, t("2024-01-01 00:00:10"), "tie-y"),
                     (7L, t("2024-01-01 00:00:10"), "tie-z"))
      in.addData((if (i % 2 == 0) rows else rows.reverse): _*)
      q.processAllAvailable()
      q.stop()
      val m = StreamingOps.readSnapshot(spark, dir).collect()
        .map(r => r.getAs[Long]("key") -> r.getAs[String]("payload")).toMap
      assert(m.size == 1)
      m(7L)
    }
    assert(winners.distinct.size == 1,
      s"equal-ts tie winner must be replay-stable, got $winners")
  }

  test("upsert tiebreaker distinguishes null-position-swapped rows; " +
      "superseded snapshot generations are GC'd to current+previous") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // (x=null, y='v') vs (x='v', y=null): xxhash64 SKIPS null inputs, so
    // a value-only fingerprint collided on these and the tie broke
    // arbitrarily. With the per-column (is-null flag, coalesced value)
    // encoding the fingerprints differ, so the winner is order-stable.
    val winners = (0 until 3).map { i =>
      implicit val sq = spark.sqlContext
      val dir = java.nio.file.Files.createTempDirectory(s"graft_upsert_nul$i").toString
      val ckpt = java.nio.file.Files.createTempDirectory(s"graft_upsert_nul_ck$i").toString
      val in = MemoryStream[(Long, java.sql.Timestamp, Option[String], Option[String])]
      val q = StreamingOps.upsertSnapshot(
        in.toDF().toDF("key", "ts", "x", "y"), dir, ckpt)
      val rows = Seq(
        (7L, t("2024-01-01 00:00:10"), Option.empty[String], Option("v")),
        (7L, t("2024-01-01 00:00:10"), Option("v"), Option.empty[String]))
      in.addData((if (i % 2 == 0) rows else rows.reverse): _*)
      q.processAllAvailable()
      q.stop()
      val r = StreamingOps.readSnapshot(spark, dir).collect()
      assert(r.length == 1)
      (Option(r(0).getAs[String]("x")), Option(r(0).getAs[String]("y")))
    }
    assert(winners.distinct.size == 1,
      s"null-swapped tie winner must be order-stable, got $winners")

    // GC: after N batches only gen=N-1 (current) and gen=N-2 survive
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert_gc").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_upsert_gc_ck").toString
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = StreamingOps.upsertSnapshot(
      in.toDF().toDF("key", "ts", "payload"), dir, ckpt)
    for (b <- 0 until 4) {
      in.addData((b.toLong, t(f"2024-01-01 00:00:${10 + b}%02d"), s"p$b"))
      q.processAllAvailable()
    }
    q.stop()
    val gens = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("gen="))
      .map(_.getName).sorted.toSeq
    assert(gens == Seq("gen=2", "gen=3"),
      s"GC must keep exactly current+previous generations, got $gens")
    assert(StreamingOps.readSnapshot(spark, dir).count() == 4)
  }
}
