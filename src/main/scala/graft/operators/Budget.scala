package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget corpus selection — "take the best documents, by score,
  * until the token budget is spent": the greedy selection step the
  * classifier-filtered pretraining recipes deploy (DCLM / FineWeb-Edu
  * style: rank by quality-classifier score, keep the prefix whose
  * cumulative token count fits the training budget). The q140/q144
  * classifiers and the DSIR weights produce the scores; THIS operator
  * turns a score column + a token-count column + one budget scalar into
  * a deterministic selected-set.
  *
  * Semantics: order rows by (score desc, id asc) — a total order, so
  * ties are deterministic — and select every row whose running token
  * total INCLUDING ITSELF is ≤ budget. The running total is monotone
  * along the order, so the selection is a prefix; equivalently (and how
  * the DuckDB oracle states it):
  * `SUM(w) OVER (ORDER BY score DESC, id ROWS UNBOUNDED PRECEDING) <= budget`.
  *
  * Planned for 100 TB (the [[Quantiles.exactPositional]] pattern — a
  * naive global-order window sorts the whole corpus on ONE task):
  *  1. `repartitionByRange(score desc, id)` spreads the sort: each slice
  *     holds a contiguous run of the global order. `Stage.cut` pins ONE
  *     materialized slicing for both consumers (the round-9 lesson: the
  *     per-slice totals and the local cumsums must see the SAME
  *     nondeterministically-sampled range boundaries).
  *  2. per-slice token totals — ≤ nSlices rows — come to the driver
  *     (a bounded driver model, like the similarity joins' numDocs) and
  *     prefix-sum into per-slice offsets, re-joined as a broadcast.
  *  3. per-row running totals are LOCAL windows keyed by slice id;
  *     global cumulative = offset + local. BIGINT end to end — exact and
  *     order-proof in any partitioning.
  */
object Budget {

  /** PER-GROUP budget selection — the data-mixing deployment shape
    * (DoReMi / per-language token targets): within every group, order
    * by (score desc, id asc) and keep the prefix whose cumulative
    * weight is ≤ `budgetNum/budgetDen` of the GROUP's total weight
    * (integer arithmetic: `cum_w ≤ (total_g · budgetNum) div budgetDen`
    * — engine-exact, SQL-expressible as two windows).
    *
    * Plan (the [[selectByBudget]] machinery with a composite range
    * key): `repartitionByRange(group, score desc, id)` — the PRIMARY
    * key is the group, so each group's global order occupies a
    * CONTIGUOUS slice range and distinct (slice, group) cells number at
    * most nSlices + nGroups − 1. The bounded driver fold turns per-cell
    * sums into per-cell exclusive offsets and per-group totals in one
    * pass; per-row cumsums stay local windows keyed by (slice, group).
    * Never a single-task window per group — a viral group (one language
    * = half the corpus) spreads over many slices exactly like q68's
    * positional quantiles. The driver model is bounded by the GROUP
    * CARDINALITY (languages, domains-classes, sources — dozens to
    * thousands); for millions of micro-groups use a plain per-group
    * window instead, where no group can straddle an executor.
    *
    * @return (groupCol, idCol, scoreCol, weightCol, group_w, cum_w,
    *         selected), one row per input row */
  def selectByBudgetPerGroup(df: DataFrame, groupCol: String, idCol: String,
      scoreCol: String, weightCol: String,
      budgetNum: Long, budgetDen: Long): DataFrame = {
    require(budgetNum >= 0L && budgetDen >= 1L,
      s"need budgetNum >= 0 and budgetDen >= 1, got $budgetNum/$budgetDen")
    val spark = df.sparkSession
    val nSlices = spark.sessionState.conf.numShufflePartitions
    val parted = df
      .select(col(groupCol), col(idCol), col(scoreCol),
        col(weightCol).cast("long").as(weightCol))
      .repartitionByRange(nSlices,
        col(groupCol).asc, col(scoreCol).desc, col(idCol).asc)
      .withColumn("pid", spark_partition_id())
      .transform(Stage.cut)
    // ≤ nSlices + nGroups − 1 cells: per-(slice, group) sums → per-cell
    // exclusive prefix offsets (ascending pid within group) + group totals
    val cells = parted.groupBy(col("pid"), col(groupCol))
      .agg(coalesce(sum(col(weightCol)), lit(0L)).as("wsum"))
      .collect().map(r => (r.getInt(0), r.get(1), r.getLong(2)))
    val byGroup = cells.groupBy(_._2)
    val offsets = byGroup.toSeq.flatMap { case (g, cs) =>
      var acc = 0L
      cs.sortBy(_._1).map { case (pid, _, wsum) =>
        val off = acc; acc += wsum; (pid, g, off)
      }
    }
    val totals = byGroup.map { case (g, cs) => g -> cs.map(_._3).sum }
    val offsetsDf = spark.createDataFrame(
        spark.sparkContext.parallelize(offsets.map { case (pid, g, off) =>
          org.apache.spark.sql.Row(pid, g,
            off, totals(g))
        }),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("pid",
            org.apache.spark.sql.types.IntegerType),
          parted.schema(groupCol),
          org.apache.spark.sql.types.StructField("offset",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("group_w",
            org.apache.spark.sql.types.LongType))))
    val wLocal = Window.partitionBy(col("pid"), col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // NULL-SAFE group equality (round 12, ADVICE): a plain using-column
    // join drops every null-group row (null = null is never true), which
    // would break the one-row-per-input-row contract — the local window
    // and the driver fold both treat null as an ordinary group value, so
    // the offsets re-attachment must too (<=>).
    val off = broadcast(offsetsDf)
      .withColumnRenamed("pid", "__opid").withColumnRenamed(groupCol, "__og")
    parted
      .withColumn("lcum", sum(col(weightCol)).over(wLocal))
      .join(off, col("pid") === col("__opid") && col(groupCol) <=> col("__og"))
      .withColumn("cum_w", col("offset") + col("lcum"))
      // DECIMAL(38,0) cross-multiply (round 12, ADVICE): any long × long
      // product is < 2^126 ≈ 8.5e37 < 1e38, so the comparison is exact
      // for EVERY representable cum_w/group_w/budget pair — the bare
      // BIGINT product silently wrapped once totals × budget terms
      // crossed 2^63 (corpus-scale token counts with a large user
      // denominator). DuckDB's oracle promotes to HUGEINT the same way.
      .withColumn("selected",
        col("cum_w").cast("decimal(38,0)") * lit(budgetDen) <=
          col("group_w").cast("decimal(38,0)") * lit(budgetNum))
      .select(col(groupCol), col(idCol), col(scoreCol), col(weightCol),
        col("group_w"), col("cum_w"), col("selected"))
  }

  /** @param budget  inclusive cumulative-weight cap (tokens)
    * @return (idCol, scoreCol, weightCol, cum_w, selected), one row per
    *         input row; `selected` marks the in-budget prefix
    */
  def selectByBudget(df: DataFrame, idCol: String, scoreCol: String,
      weightCol: String, budget: Long): DataFrame = {
    require(budget >= 0L, s"budget must be >= 0, got $budget")
    val spark = df.sparkSession
    val nSlices = spark.sessionState.conf.numShufflePartitions
    // the BIGINT contract is enforced, not assumed: an int/double weight
    // column is cast up front (so every cumsum below sums longs), and an
    // all-NULL slice's sum coalesces to 0 instead of NPEing the driver fold
    val parted = df
      .select(col(idCol), col(scoreCol), col(weightCol).cast("long").as(weightCol))
      .repartitionByRange(nSlices, col(scoreCol).desc, col(idCol).asc)
      .withColumn("pid", spark_partition_id())
      .transform(Stage.cut)
    // ≤ nSlices rows: the bounded driver fold (ascending pid) that turns
    // per-slice totals into exclusive prefix offsets
    val perSlice = parted.groupBy(col("pid"))
      .agg(coalesce(sum(col(weightCol)), lit(0L)).as("wsum"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = perSlice
      .scanLeft((0, 0L, 0L)) { case ((_, _, acc), (pid, wsum)) =>
        (pid, acc, acc + wsum)
      }
      .drop(1).map { case (pid, off, _) => (pid, off) }
    val offsetsDf = spark.createDataFrame(offsets.toSeq).toDF("pid", "offset")
    val wLocal = Window.partitionBy(col("pid"))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parted
      .withColumn("lcum", sum(col(weightCol)).over(wLocal))
      .join(broadcast(offsetsDf), "pid")
      .withColumn("cum_w", col("offset") + col("lcum"))
      .withColumn("selected", col("cum_w") <= lit(budget))
      .select(col(idCol), col(scoreCol), col(weightCol),
        col("cum_w"), col("selected"))
  }
}
