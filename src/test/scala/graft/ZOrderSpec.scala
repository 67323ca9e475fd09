package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Z-order clustering contracts: the Morton interleave itself, and the
  * locality it buys — every output file covers a compact (user, time)
  * box, so a filter on EITHER dimension overlaps few files, while a
  * single-column-sorted layout can only prune on its sort column.
  */
class ZOrderSpec extends AnyFunSuite {
  import SparkSuiteBase.{spark, sfDir}

  test("interleave places bit b of dim i at position b*n + i") {
    import spark.implicits._
    val r = Seq((3L, 0L, 5L, 6L)).toDF("x", "y", "a", "b")
      .select(
        sources.ZOrder.interleave(Seq($"x", $"y"), 2).as("x_only"),
        sources.ZOrder.interleave(Seq($"y", $"x"), 2).as("y_only"),
        sources.ZOrder.interleave(Seq($"a", $"b"), 3).as("mixed"))
      .head()
    // x=0b11 in even positions -> 0b0101; swapped -> odd positions 0b1010
    assert(r.getLong(0) == 5L)
    assert(r.getLong(1) == 10L)
    // a=0b101, b=0b110 -> bits (a0,b0,a1,b1,a2,b2) = 1,0,0,1,1,1 -> 0b111001
    assert(r.getLong(2) == 57L)
  }

  test("interleave/deinterleave round-trip over random dim values") {
    import spark.implicits._
    // hash-derived pseudo-random 16-bit dims (deterministic, no Random)
    val df = spark.range(1000).select(
      pmod(xxhash64($"id"), lit(65536L)).as("x"),
      pmod(xxhash64($"id", lit(1)), lit(65536L)).as("y"),
      pmod(xxhash64($"id", lit(2)), lit(65536L)).as("w"))
    // MATERIALIZE the z codes first (a projection is not enough —
    // CollapseProject re-inlines it): composing deinterleave over an
    // inline interleave expression duplicates the whole 48-term OR tree
    // into each of the 80 recovered bits (~15k generated lines — past
    // janino's method limit; this test was the one CodeGenerator ERROR
    // in the r12 suite log; Spark fell back to interpreted and the test
    // still passed). A stored z column is also how any real reader
    // holds a Morton code — never a re-derivation.
    val withZ = df.withColumn("z2",
        sources.ZOrder.interleave(Seq($"x", $"y"), 16))
      .withColumn("z3", sources.ZOrder.interleave(Seq($"x", $"y", $"w"), 16))
      .localCheckpoint(true)
    val bad = withZ.select(
      ($"x" === sources.ZOrder.deinterleave($"z2", 0, 2, 16)).as("x2"),
      ($"y" === sources.ZOrder.deinterleave($"z2", 1, 2, 16)).as("y2"),
      ($"x" === sources.ZOrder.deinterleave($"z3", 0, 3, 16)).as("x3"),
      ($"y" === sources.ZOrder.deinterleave($"z3", 1, 3, 16)).as("y3"),
      ($"w" === sources.ZOrder.deinterleave($"z3", 2, 3, 16)).as("w3"))
      .filter(!$"x2" || !$"y2" || !$"x3" || !$"y3" || !$"w3")
    assert(bad.count() == 0)
  }

  test("z-ordered files prune on both dims; user-sorted layout cannot prune on time") {
    import spark.implicits._
    val ev = Tables(spark, sfDir, "events")
      .select($"event_id", $"user_id", unix_micros($"ts").as("us"))
    val zDir = java.nio.file.Files.createTempDirectory("graft_z").toString
    val uDir = java.nio.file.Files.createTempDirectory("graft_u").toString
    sources.ZOrder.writeZOrdered(ev, zDir, Seq("user_id", "us"), numFiles = 16)
    ev.repartitionByRange(16, $"user_id")
      .sortWithinPartitions($"user_id")
      .write.mode("overwrite").parquet(uDir)

    def fileBoxes(dir: String) =
      spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min($"user_id").as("ulo"), max($"user_id").as("uhi"),
          min($"us").as("tlo"), max($"us").as("thi"))
        .collect()

    val bounds = ev.agg(min($"us"), max($"us")).head()
    val (tmin, tmax) = (bounds.getLong(0), bounds.getLong(1))
    // middle-quarter time slice: a filter the user-sorted layout is blind to
    val qlo = tmin + (tmax - tmin) / 2
    val qhi = tmin + (tmax - tmin) / 2 + (tmax - tmin) / 4
    def overlapping(dir: String): Int =
      fileBoxes(dir).count(r =>
        r.getAs[Long]("tlo") <= qhi && r.getAs[Long]("thi") >= qlo)

    val zHit = overlapping(zDir)
    val uHit = overlapping(uDir)
    val zTotal = fileBoxes(zDir).length
    assert(zTotal >= 12, s"expected ~16 z files, got $zTotal")
    assert(uHit >= zTotal - 2, s"user-sorted layout should overlap ~all files, got $uHit")
    assert(zHit * 2 <= uHit, s"z-order should halve time-filter file hits: z=$zHit vs u=$uHit")
    // and the z layout still prunes on user_id too: quarter box on users
    val ub = ev.agg(min($"user_id"), max($"user_id")).head()
    val (umin, umax) = (ub.getLong(0), ub.getLong(1))
    val uqlo = umin + (umax - umin) / 2
    val uqhi = uqlo + (umax - umin) / 4
    val zUserHit = fileBoxes(zDir).count(r =>
      r.getAs[Long]("ulo") <= uqhi && r.getAs[Long]("uhi") >= uqlo)
    assert(zUserHit * 2 <= zTotal,
      s"z-order should prune user filters too: $zUserHit of $zTotal")
  }

  test("manifest-planned read skips files yet returns exactly the full-scan result") {
    import spark.implicits._
    val ev = Tables(spark, sfDir, "events")
      .select($"event_id", $"user_id", unix_micros($"ts").as("us"))
    val dir = java.nio.file.Files.createTempDirectory("graft_manifest").toString
    sources.ZOrder.writeZOrdered(ev, dir, Seq("user_id", "us"), numFiles = 16)
    sources.ZOrder.writeManifest(spark, dir, Seq("user_id", "us"))

    val b = ev.agg(min($"us"), max($"us")).head()
    val (tmin, tmax) = (b.getLong(0), b.getLong(1))
    val (lo, hi) = (tmin + (tmax - tmin) / 2, tmin + (tmax - tmin) / 2 + (tmax - tmin) / 8)

    val (pruned, filesRead, filesTotal) =
      sources.ZOrder.prunedRead(spark, dir, "us", lo, hi)
    assert(filesTotal >= 12 && filesRead < filesTotal,
      s"expected pruning: read $filesRead of $filesTotal")
    val got = pruned.select($"event_id").collect().map(_.getLong(0)).sorted
    val want = spark.read.parquet(dir).filter($"us".between(lo, hi))
      .select($"event_id").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(want), "pruned read must equal full scan + filter")
    assert(want.nonEmpty)

    // a box outside the data prunes everything and yields an empty frame
    val (empty, zeroFiles, _) =
      sources.ZOrder.prunedRead(spark, dir, "us", tmax + 10, tmax + 20)
    assert(zeroFiles == 0 && empty.count() == 0)

    // staleness guard: a data file written AFTER the manifest must force
    // the full-scan fallback (correct rows, no silent loss) rather than
    // being invisibly excluded
    ev.filter($"us".between(lo, hi)).limit(5)
      .write.mode("append").parquet(dir)
    val (stale, staleRead, staleTotal) =
      sources.ZOrder.prunedRead(spark, dir, "us", lo, hi)
    assert(staleRead == staleTotal, "stale manifest must disable pruning")
    val gotStale = stale.select($"event_id").collect().map(_.getLong(0)).sorted
    val wantStale = spark.read.parquet(dir).filter($"us".between(lo, hi))
      .select($"event_id").collect().map(_.getLong(0)).sorted
    assert(gotStale.sameElements(wantStale),
      "fallback read must equal full scan + filter on the LIVE directory")
    assert(gotStale.length == want.length + 5)
  }
}
