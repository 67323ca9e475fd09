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
  /** Internal: left rows + `__match`, the matched right ROW as one struct
    * (fields: `__mts` = its timestamp, then the payload columns). Carrying
    * the whole row atomically — rather than a per-column
    * `last(ignoreNulls)` — matters when payload columns can be NULL: a
    * per-column carry would stitch values from DIFFERENT right rows (and
    * break any freshness judgment on the matched timestamp). */
  private def asOfMatch(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      payload: Seq[String]): DataFrame = {
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

    val tagged = taggedRight.unionByName(taggedLeft)
      .withColumn("__pstruct",
        when($"__side" === 0,
          struct($"__ts".as("__mts") +: payload.map(c => col(s"__p_$c").as(c)): _*)))

    // the struct joins the sort key (after ts/side): equal-timestamp right
    // rows resolve deterministically (lexicographic over payload values)
    val w = Window.partitionBy($"__k")
      .orderBy($"__ts".asc, $"__side".asc, $"__pstruct".asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    tagged
      .withColumn("__match", last($"__pstruct", ignoreNulls = true).over(w))
      .filter($"__side" === 1)
      .select(leftCols.map(c => col(s"__l_$c").as(c)) :+ col("__match"): _*)
  }

  def asOf(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      payload: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    val leftCols = left.columns.toSeq
    asOfMatch(left, right, keyCol, tsCol, payload)
      .select(leftCols.map(col) ++
        payload.map(c => col("__match").getField(c).as(s"$prefix$c")): _*)
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
    val leftCols = left.columns.toSeq
    // freshness is judged on the matched ROW's own timestamp (a struct
    // field, atomic with its payload) — a NULL payload column in the
    // nearest row can never un-mask an older row's value
    val fresh = col("__match").isNotNull &&
      col("__match").getField("__mts") >= col(tsCol) - tolerance
    asOfMatch(left, right, keyCol, tsCol, payload)
      .select(leftCols.map(col) ++
        payload.map(c =>
          when(fresh, col("__match").getField(c)).as(s"$prefix$c")): _*)
  }
}
