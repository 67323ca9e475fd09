package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, content-stable sampling and dataset splitting for
  * training-data pipelines.
  *
  * Why not `randomSplit`/`sample`: their assignment depends on partition
  * layout and seed plumbing — re-running after appending rows (or on a
  * different cluster) reshuffles existing assignments, which silently
  * contaminates train/test boundaries. Hashing the ROW ID instead gives
  * every row a permanent bucket: the same row lands in the same split on
  * any engine, any day, any partitioning, and new rows never move old
  * ones. md5 is used (not xxhash64) because its hex output is identical
  * in every engine — the assignment itself is oracle-checkable in DuckDB
  * (q58).
  *
  * All pure map-side Column expressions — no shuffle, no state, linear at
  * any scale.
  */
object Sampling {

  /** 16-bit bucket key: first 4 hex chars of md5(id) — 65536 buckets,
    * lowercase hex in every engine. The SPLIT grid ([[deterministicSplit]]
    * weights are human-scale fractions, and q58's oracle pins these exact
    * buckets). */
  private def bucket(idCol: Column): Column =
    substring(md5(idCol.cast("string").cast("binary")), 1, 4)

  private def hexThreshold(cum: Double): String =
    f"${math.min(65535, math.floor(cum * 65536).toLong)}%04x"

  /** 32-bit SAMPLE key: first 8 hex chars of md5(id). [[hashSample]]'s
    * fractions are `cap / corpusSize` — at corpus scale they are TINY
    * (2000 of 10^10 rows ≈ 2e-7), and the 16-bit grid quantized them to
    * whole 1/65536 steps: up to 2× skew between a classifier's paired
    * class samples (measured at the 100M decade: 1068 pos vs 1831 neg
    * drawn for equal 2000-caps ⇒ logistic bias −0.47 ⇒ a tau=0.5 gate
    * kept 0 of 100M docs), and an EMPTY sample once fraction < 1/65536
    * (~3·10^9 rows). The 32-bit grid holds the cap within ±0.4% out to
    * ~10^13 rows. */
  private def sampleKey(idCol: Column): Column =
    substring(md5(idCol.cast("string").cast("binary")), 1, 8)

  private def hexThreshold8(cum: Double): String =
    f"${math.min(4294967295L, math.floor(cum * 4294967296.0).toLong)}%08x"

  /** Assign each row a split label by cumulative weight ranges over the
    * hash buckets. `splits` are (label, weight) with weights summing to ~1;
    * boundaries are stable string comparisons on the hex bucket. */
  def deterministicSplit(
      df: DataFrame, idCol: String, splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    val cums = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w }.tail
    val b = bucket(col(idCol))
    val labeled = splits.zip(cums).dropRight(1).foldRight(
        lit(splits.last._1): Column) { case (((label, _), cum), rest) =>
      when(b < lit(hexThreshold(cum)), lit(label)).otherwise(rest)
    }
    df.withColumn("split", labeled)
  }

  /** Keep a deterministic ~`fraction` of rows by id hash — stable across
    * runs, engines and data growth (a row once kept is always kept).
    *
    * CROSS-VERSION note (round 12): the sample key widened from 16 to
    * 32 bits (the quantization fix above), which changes MEMBERSHIP for
    * every consumer relative to pre-r12 builds — the once-kept-always-
    * kept guarantee holds within a key version, not across the widening.
    * All in-repo oracles/mirrors moved in tandem; any EXTERNALLY
    * persisted sample or model artifact built on the old key is
    * invalidated and should be re-drawn. [[deterministicSplit]] kept the
    * 16-bit key (split fractions are never corpus-tiny; q58 pins it). */
  def hashSample(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0)
    if (fraction >= 1.0) df // 'ffffffff' is a valid key; < threshold would drop it
    else df.filter(sampleKey(col(idCol)) < lit(hexThreshold8(fraction)))
  }

  /** Domain-mixing cap: keep at most `k` rows per group, chosen by md5(id)
    * order — a deterministic, content-stable "uniform" draw (the same k
    * rows win on any engine, any day; adding rows with new ids can only
    * displace, never reshuffle, and removal never promotes a row ahead of
    * a surviving one). One shuffle keyed by the group; the rank filter is
    * a WindowGroupLimit in Spark ≥3.5, so each partition keeps only k rows
    * per key during the sort — no full per-group materialization even for
    * a skewed giant domain. */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String, k: Int): DataFrame = {
    require(k >= 1)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string").cast("binary")).asc, col(idCol).asc)
    df.withColumn("draw_rank", row_number().over(w))
      .filter(col("draw_rank") <= k)
  }
}
