package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact positional quantiles per group, planned for a 100 TB table.
  *
  * The naive plan — `Window.partitionBy(group).orderBy(value)` +
  * `row_number` — sorts every group on ONE task, so parallelism equals the
  * number of groups (5 market segments ⇒ 5 tasks sorting the whole fact
  * table). This operator keeps the pick-by-index exactness but spreads the
  * sort over all shuffle partitions:
  *
  *  1. `repartitionByRange(group, value)` — a range exchange over BOTH
  *     keys, so each slice holds a contiguous value range of one (or a
  *     few) group(s). Explicit numPartitions makes it REPARTITION_BY_NUM,
  *     which AQE never re-coalesces.
  *  2. per-slice `row_number` — local sort of ~1/nSlices of the data.
  *  3. a tiny (nSlices × nGroups) count table turned into cumulative
  *     offsets via a window, broadcast back — global rank = offset + local
  *     rank. The range exchange is planned once and reused for both
  *     consumers (ReusedExchange, default-on).
  *  4. pick value at rank `ceil(p·n)` per group — exact, no interpolation.
  *
  * Pinned shuffle-shape: `PlanAuditSpec` (q68) asserts the slice-id
  * machinery is present; `CORRECTNESS` q68 pins exactness against DuckDB.
  */
object Quantiles {

  /** @param ps output-column-name → quantile in (0,1], e.g. "p50_c" -> 0.5
    * @return one row per group: groupCol, nName, then one column per entry
    *         of `ps`, ordered by groupCol
    */
  def exactPositional(
      df: DataFrame,
      groupCol: String,
      valCol: String,
      ps: Seq[(String, Double)],
      nName: String = "n"): DataFrame = {
    val spark = df.sparkSession
    val nSlices = spark.sessionState.conf.numShufflePartitions
    // localCheckpoint: `parted` feeds BOTH the per-slice count/offset
    // aggregate and the local-rank join. Without the lineage cut those are
    // two evaluations of the range exchange — and if exchange reuse does
    // not kick in (separate actions over the same frame, AQE re-planning),
    // the range sampler sees a DIFFERENT nondeterministic shuffle row
    // order each time, slice boundaries shift between the two subtrees,
    // and offset+local-rank stops being a global rank: a silently wrong
    // quantile (observed: a tercile cutoff below the true rank value when
    // the input lineage contained a fresh LM-scoring shuffle). The
    // checkpoint pins one materialized slicing for all consumers —
    // reliable when the session has a checkpoint dir (Stage.cut).
    val parted = df
      .repartitionByRange(nSlices, col(groupCol), col(valCol))
      .withColumn("pid", spark_partition_id())
      .transform(Stage.cut)
    val perSlice = parted.groupBy(col("pid"), col(groupCol))
      .agg(count(lit(1)).as("cnt"))
    val wOff = Window.partitionBy(col(groupCol)).orderBy(col("pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = perSlice
      .withColumn("offset", coalesce(sum(col("cnt")).over(wOff), lit(0L)))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col(groupCol))))
      .select(col("pid"), col(groupCol), col("offset"), col("n"))
    val wLocal = Window.partitionBy(col("pid"), col(groupCol)).orderBy(col(valCol))
    val ranked = parted
      .withColumn("lrn", row_number().over(wLocal))
      .join(broadcast(offsets), Seq("pid", groupCol))
      .withColumn("rn", col("offset") + col("lrn"))
    def pick(p: Double): Column =
      max(when(col("rn") === ceil(lit(p) * col("n")).cast("bigint"), col(valCol)))
    val aggCols = max(col("n")).as(nName) +:
      ps.map { case (name, p) => pick(p).as(name) }
    ranked.groupBy(col(groupCol))
      .agg(aggCols.head, aggCols.tail: _*)
      .orderBy(col(groupCol))
  }
}
