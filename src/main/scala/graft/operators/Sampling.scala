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
    * lowercase hex in every engine. */
  private def bucket(idCol: Column): Column =
    substring(md5(idCol.cast("string").cast("binary")), 1, 4)

  private def hexThreshold(cum: Double): String =
    f"${math.min(65535, math.floor(cum * 65536).toLong)}%04x"

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
    * runs, engines and data growth (a row once kept is always kept). */
  def hashSample(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0)
    if (fraction >= 1.0) df // 'ffff' is a valid bucket; < threshold would drop it
    else df.filter(bucket(col(idCol)) < lit(hexThreshold(fraction)))
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
