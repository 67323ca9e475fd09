package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton curve) clustering for multi-dimensional data skipping.
  *
  * Sorting a lake by one column gives tight parquet min/max stats on that
  * column only — a filter on any other column reads every file. Sorting by
  * the interleaved bits of several columns gives each file a small
  * hyper-rectangle of the key space, so point/box filters on ANY clustered
  * dimension prune most files. This is the layout lever behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY`; at 100 TB it turns "scan a day of
  * data" into "scan the handful of files whose (user, time) box overlaps".
  *
  * Everything is Column algebra (shifts/masks built as a static expression
  * tree) — whole-stage codegen, no UDF. Dimension values are first
  * rank-normalized to [0, 2^bits) with min/max scaling from a 1-row
  * bounds aggregate (broadcast; the same bounded-probe shape as the
  * gap-fill grid), so skewed or negative domains interleave cleanly.
  */
object ZOrder {

  /** Interleave `dims` (each already an integer in [0, 2^bits)) into a
    * single Morton code: bit b of dim d lands at position b*n + d.
    * n*bits must fit a signed 64-bit long (≤ 62). */
  def interleave(dims: Seq[Column], bits: Int): Column = {
    val n = dims.size
    require(n * bits <= 62, s"z-value would overflow a long: $n dims x $bits bits")
    val pieces = for {
      b <- 0 until bits
      (d, i) <- dims.zipWithIndex
    } yield shiftleft(shiftright(d, b).bitwiseAND(lit(1L)), b * n + i)
    pieces.reduce(_.bitwiseOR(_))
  }

  /** Inverse of [[interleave]]: recover dim `i` of `n` from a Morton
    * code (bit b of the result comes from z-bit b*n + i). Useful for
    * debugging curve layouts and for planning range scans over a
    * z-clustered lake without the original columns.
    *
    * Pass `z` as a MATERIALIZED column (a stored/checkpointed column —
    * a mere projection is re-inlined by CollapseProject), not an inline
    * [[interleave]] expression: Catalyst inlines the whole n·bits-term
    * OR tree into every recovered bit, and recovering all dims of an
    * inline code generates ~15k lines — past janino's method limit, so
    * whole-stage codegen falls back to interpreted for the stage
    * (correct but slow; was the one CodeGenerator ERROR in the r12
    * suite log). */
  def deinterleave(z: Column, i: Int, n: Int, bits: Int): Column = {
    val pieces = for (b <- 0 until bits)
      yield shiftleft(shiftright(z, b * n + i).bitwiseAND(lit(1L)), b)
    pieces.reduce(_.bitwiseOR(_))
  }

  /** Min/max-scale `c` into [0, 2^bits) given its global bounds. The
    * scale factor is computed in double; ties at the top collapse into
    * the last cell, and a degenerate (constant) dimension maps to 0. */
  private def scaled(c: Column, lo: Column, hi: Column, bits: Int): Column = {
    val cells = math.pow(2, bits).toLong
    val span = (hi - lo).cast("double")
    when(span === 0.0, lit(0L)).otherwise(
      least(
        floor((c - lo).cast("double") / span * cells).cast("long"),
        lit(cells - 1)))
  }

  /** `df` with a `__z` Morton-code column over `dimCols` (numeric). The
    * bounds aggregate is one tiny job; everything else is map-side. */
  def withZValue(df: DataFrame, dimCols: Seq[String], bits: Int = 16): DataFrame = {
    val aggCols = dimCols.flatMap(d =>
      Seq(min(col(d)).as(s"__lo_$d"), max(col(d)).as(s"__hi_$d")))
    val bounds = df.agg(aggCols.head, aggCols.tail: _*)
    val joined = df.crossJoin(broadcast(bounds))
    val scaledDims = dimCols.map(d =>
      scaled(col(d), col(s"__lo_$d"), col(s"__hi_$d"), bits))
    joined
      .withColumn("__z", interleave(scaledDims, bits))
      .drop(dimCols.flatMap(d => Seq(s"__lo_$d", s"__hi_$d")): _*)
  }

  /** Write `df` as `numFiles` parquet files clustered on the Morton code
    * of `dimCols`: range-partition by z (contiguous curve segments per
    * file), sort within, drop the helper column. Each output file covers
    * a compact box of the dim space — its per-column min/max footer
    * stats are what the reader's file/row-group pruning consumes. */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      dimCols: Seq[String],
      numFiles: Int,
      bits: Int = 16): Unit = {
    withZValue(df, dimCols, bits)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Manifest-planned scans: the table-format trick without the table
    * format. [[writeManifest]] collects per-file min/max of the
    * clustered dims into `path/_manifest` (one distributed aggregate
    * over file names — a few KB for thousands of files); [[prunedRead]]
    * intersects a box predicate with the manifest FIRST and hands Spark
    * only the surviving file list. At 100 TB this removes the
    * footer-open cost of every skipped file: planning touches the
    * manifest (one tiny parquet), not 100k file footers. */
  def writeManifest(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      dimCols: Seq[String]): Unit = {
    val aggs = dimCols.flatMap(d =>
      Seq(min(col(d)).as(s"lo_$d"), max(col(d)).as(s"hi_$d"))) :+
      count(lit(1)).as("n_rows")
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_manifest")
  }

  /** Read only the files whose manifest box overlaps `[lo, hi]` on
    * `dim`. Returns the pruned frame plus (filesRead, filesTotal). The
    * residual filter still applies row-level — pruning is a superset
    * guarantee, identical results to a full scan + filter.
    *
    * Staleness guard: a data file written AFTER the manifest (or a
    * re-written lake with a stale manifest) would silently vanish from
    * the read, turning the superset guarantee into missing rows — so
    * the live directory listing is cross-checked against the manifest's
    * file set first, and any unmanifested data file forces a full-scan
    * fallback (correct, just unpruned). The listing is file-count-scale,
    * the same cost planning pays anyway. */
  def prunedRead(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      dim: String,
      lo: Long,
      hi: Long): (DataFrame, Int, Int) = {
    val manifest = spark.read.parquet(s"$path/_manifest")
      .select(col("file"), col(s"lo_$dim"), col(s"hi_$dim"))
      .collect()
    val fallback = (spark.read.parquet(path).filter(col(dim).between(lo, hi)),
      manifest.length, manifest.length)
    // input_file_name() URIs vs FileSystem paths differ in scheme
    // spelling; compare by basename, which parquet part-files make
    // unique within a directory (task UUID in the name).
    val manifested = manifest.map(r =>
      r.getAs[String]("file").split('/').last).toSet
    val hadoopPath = new org.apache.hadoop.fs.Path(path)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = fs.listStatus(hadoopPath).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
      .map(_.getPath.getName)
    if (!live.forall(manifested.contains)) return fallback
    val keep = manifest.collect {
      case r if r.getAs[Long](s"lo_$dim") <= hi && r.getAs[Long](s"hi_$dim") >= lo =>
        r.getAs[String]("file")
    }
    val df =
      if (keep.isEmpty) spark.read.parquet(path).filter(lit(false))
      else spark.read.parquet(keep.toSeq: _*).filter(col(dim).between(lo, hi))
    (df, keep.length, manifest.length)
  }
}
