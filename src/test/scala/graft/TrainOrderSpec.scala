package graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.TrainOrder

/** Contract battery for the deterministic training-order shuffle (q151):
  * the sharded range-partition plan must produce the exact 1-based rank
  * of each row in (md5(seed:id), id) order — verified against a
  * straight-line JVM digest-and-sort on a corpus large enough to span
  * many range slices — and the permutation must be a pure function of
  * (seed, id set): partitioning-invariant, seed-sensitive. */
class TrainOrderSpec extends AnyFunSuite {
  import SparkSuiteBase.spark
  import spark.implicits._

  private def jvmMd5Hex(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString

  test("positions are the exact global digest-order ranks (10k ids, many slices)") {
    val ids = (0L until 10000L)
    val got = TrainOrder.deterministicShuffle(ids.toDF("id"), "id", "s1")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val expected = ids.map(id => (id, jvmMd5Hex(s"s1:$id")))
      .sortBy { case (id, k) => (k, id) }
      .zipWithIndex.map { case ((id, k), i) => (id, k, i + 1L) }
      .sortBy(_._1).toSeq
    assert(got == expected)
    // every position exactly once
    assert(got.map(_._3).sorted == (1L to 10000L))
  }

  test("partitioning-invariant; different seed = different permutation") {
    val df = spark.range(5000).toDF("id")
    val base = TrainOrder.deterministicShuffle(df, "id", "e0")
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).toSeq
    val repart = TrainOrder.deterministicShuffle(df.repartition(7), "id", "e0")
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).toSeq
    assert(repart == base)
    val other = TrainOrder.deterministicShuffle(df, "id", "e1")
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).toSeq
    assert(other != base)
    assert(other.map(_._2).sorted == base.map(_._2).sorted) // same rank set
  }

  test("edges: empty input, single row") {
    assert(TrainOrder.deterministicShuffle(
      spark.range(0).toDF("id"), "id", "s").count() == 0L)
    val one = TrainOrder.deterministicShuffle(
        spark.range(1).toDF("id"), "id", "s")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(one == Seq((0L, 1L)))
  }

  test("writeOrdered sink: lossless round trip, pos-contiguous files, " +
      "ordered disjoint manifest — a loader streams with zero sorting") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ordsink").toString
    val n = 5000L
    val df = spark.range(n).toDF("id")
    val back = TrainOrder.writeOrdered(df, "id", "ep0", dir, nFiles = 8)
    // round trip is EXACTLY the permutation
    val want = TrainOrder.deterministicShuffle(df, "id", "ep0")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val got = back.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(got == want)
    // each data file holds a CONTIGUOUS pos range, rows pos-sorted inside
    // (read row order per file IS the loader's stream order)
    val perFile = spark.read.parquet(s"$dir/data")
      .select(input_file_name().as("file"), col("pos"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    assert(perFile.size > 1, "sink should spread over multiple files")
    perFile.values.foreach { ps =>
      assert(ps == ps.sorted, "rows inside a file must be pos-sorted")
      assert(ps.last - ps.head + 1 == ps.length, "file pos range must be contiguous")
    }
    // manifest: one row per data file, ordered by min_pos, ranges disjoint
    // and covering 1..n
    val manifest = spark.read.parquet(s"$dir/manifest")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(manifest.map(_._1).toSet == perFile.keySet)
    assert(manifest == manifest.sortBy(_._2), "manifest must arrive ordered by min_pos")
    val ranges = manifest.sortBy(_._2)
    assert(ranges.head._2 == 1L && ranges.last._3 == n)
    ranges.sliding(2).foreach { case Seq(a, b) =>
      assert(b._2 == a._3 + 1, s"manifest ranges must chain: $a then $b")
    case _ => }
    assert(ranges.map(_._4).sum == n)
  }
}
