package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, attach the most recent
  * right row with `right.ts <= left.ts` for the same key — the lookup that
  * keeps feature pipelines leak-free (a training example may only see
  * state that existed at its own timestamp).
  *
  * Spark has no asof-join operator; rather than a custom SparkPlan, this
  * composes built-ins (SURVEY §7.2 preference (a)): tag both sides, union,
  * and take a running `last(ignoreNulls)` of the right-side payload over a
  * per-key window ordered by (ts, side) — right rows sort before left rows
  * at equal timestamps, so the match is inclusive. Cost: ONE shuffle on
  * the key (the union sorts within partitions) — cheaper than the
  * range-join + argmax alternative, and skew-safe as long as single keys
  * fit a partition's sort spill budget.
  */
object AsOfJoin {

  /** @param left      probe side
    * @param right     reference side (its columns come back prefixed)
    * @param keyCol    equi-key on both sides
    * @param tsCol     event-time column on both sides
    * @param payload   right-side columns to carry (others dropped)
    * @param prefix    prefix for carried right columns in the output
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      payload: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._

    val leftCols = left.columns.toSeq
    // side 0 = right (sorts first at equal ts ⇒ inclusive match)
    val taggedRight = right.select(
      (Seq(col(keyCol).as("__k"), col(tsCol).as("__ts"), lit(0).as("__side")) ++
        payload.map(c => col(c).as(s"__p_$c")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c"))): _*)
    val taggedLeft = left.select(
      (Seq(col(keyCol).as("__k"), col(tsCol).as("__ts"), lit(1).as("__side")) ++
        payload.map(c => lit(null).cast(right.schema(c).dataType).as(s"__p_$c")) ++
        leftCols.map(c => col(c).as(s"__l_$c"))): _*)

    // payload columns join the sort key (after ts/side) so equal-timestamp
    // right rows resolve deterministically across runs
    val w = Window.partitionBy($"__k")
      .orderBy($"__ts".asc +: $"__side".asc +:
        payload.map(c => col(s"__p_$c").asc_nulls_first): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = taggedRight.unionByName(taggedLeft)
      .select(
        (Seq($"__k", $"__ts", $"__side") ++
          payload.map(c => last(col(s"__p_$c"), ignoreNulls = true).over(w).as(s"$prefix$c")) ++
          leftCols.map(c => col(s"__l_$c"))): _*)

    carried.filter($"__side" === 1)
      .select(leftCols.map(c => col(s"__l_$c").as(c)) ++
        payload.map(c => col(s"$prefix$c")): _*)
  }

  /** As-of join with a staleness tolerance: the match must satisfy
    * `left.ts - tolerance <= right.ts <= left.ts`; older state comes back
    * NULL. Exact by construction: the plain as-of match is the NEAREST
    * at-or-before right row, so if it falls outside the tolerance window
    * nothing inside the window exists — masking it is the correct answer,
    * and the plan stays the same single key-shuffle.
    *
    * @param tolerance an interval Column, e.g. `expr("INTERVAL 1 HOUR")`
    */
  def asOfWithin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      payload: Seq[String],
      tolerance: Column,
      prefix: String = "asof_"): DataFrame = {
    require(!payload.contains(tsCol), s"$tsCol is carried implicitly")
    val joined = asOf(left, right, keyCol, tsCol, payload :+ tsCol, prefix)
    val fresh = col(s"$prefix$tsCol").isNotNull &&
      col(s"$prefix$tsCol") >= col(tsCol) - tolerance
    payload.foldLeft(joined) { (df, c) =>
      df.withColumn(s"$prefix$c", when(fresh, col(s"$prefix$c")))
    }.drop(s"$prefix$tsCol")
  }
}
