package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic training-order shuffle — the global pseudo-random
  * permutation a pretraining run applies to its packed contexts before
  * the data loader reads them (examples must arrive in a fixed but
  * decorrelated order; the same seed must reproduce the same order on
  * every rerun, cluster size and partitioning notwithstanding).
  *
  * Semantics: every row gets `shuffle_key = md5(seed || ':' || id)` and
  * `pos` = its 1-based rank in the total order (shuffle_key asc, id asc)
  * — id breaks the (practically impossible) digest ties, so the
  * permutation is a pure function of (seed, id set). md5 rather than
  * xxhash64 because BOTH engines implement it identically (the
  * deterministic-split precedent: lowercase hex over the UTF-8 bytes),
  * so the DuckDB oracle can state the semantics verbatim as ONE global
  * `ROW_NUMBER() OVER (ORDER BY shuffle_key, id)` window.
  *
  * The Spark plan must never BE that window (a global-order window ranks
  * the whole corpus on one task). This is the [[Quantiles.exactPositional]]
  * machinery on the digest key:
  *  1. `repartitionByRange(shuffle_key, id)` — md5 output is uniform by
  *     construction, so the range sampler cuts near-equal slices and NO
  *     key skew exists by design (the one shuffle this operator needs;
  *     a training-order shuffle is definitionally a full repartition).
  *  2. per-slice row counts — ≤ nSlices rows — fold into exclusive
  *     offsets on the driver (bounded model, no unpartitioned window),
  *     re-attached as a broadcast join.
  *  3. `pos` = offset + local `row_number` keyed by the slice id, with
  *     `Stage.cut` pinning ONE materialized slicing for the count pass
  *     and the rank pass (the round-9 two-traversal lesson: range
  *     boundaries are sampled nondeterministically, so two evaluations
  *     could slice differently and break offset+local = global).
  *
  * At 100 TB the output is written range-partitioned/sorted by `pos`
  * so the loader streams slices in order without another sort — that is
  * [[writeOrdered]].
  */
object TrainOrder {

  /** @param idCol BIGINT-compatible unique row id (cast to string for
    *              the digest exactly like DuckDB's CAST(id AS VARCHAR))
    * @param seed  any string; same seed ⇒ same permutation
    * @return (idCol, shuffle_key, pos), one row per input row */
  def deterministicShuffle(df: DataFrame, idCol: String, seed: String): DataFrame = {
    val spark = df.sparkSession
    val nSlices = spark.sessionState.conf.numShufflePartitions
    val keyed = df
      .select(col(idCol),
        md5(concat(lit(seed), lit(":"), col(idCol).cast("string"))
          .cast("binary")).as("shuffle_key"))
      .repartitionByRange(nSlices, col("shuffle_key").asc, col(idCol).asc)
      .withColumn("pid", spark_partition_id())
      .transform(Stage.cut)
    // ≤ nSlices rows to the driver: per-slice counts → exclusive offsets
    val counts = keyed.groupBy(col("pid")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = {
      var acc = 0L
      counts.map { case (pid, cnt) => val off = acc; acc += cnt; (pid, off) }
    }
    val offsetsDf = spark.createDataFrame(offsets.toSeq).toDF("pid", "offset")
    val wLocal = Window.partitionBy(col("pid"))
      .orderBy(col("shuffle_key").asc, col(idCol).asc)
    keyed
      .withColumn("lrn", row_number().over(wLocal).cast("long"))
      .join(broadcast(offsetsDf), Seq("pid"))
      .withColumn("pos", col("offset") + col("lrn"))
      .select(col(idCol), col("shuffle_key"), col("pos"))
  }

  /** Materialize the permutation AS A STREAMABLE LAYOUT — the sink the
    * scaladoc above promises: `nFiles` parquet files, each holding one
    * CONTIGUOUS `pos` range with rows sorted by `pos` inside, plus a
    * manifest (file, min_pos, max_pos, n_rows) ordered by min_pos. A
    * data loader streams the files in manifest order and reads training
    * examples in exact global order with ZERO sorting at load time —
    * without this layout every epoch re-sorts the corpus.
    *
    * Plan: [[deterministicShuffle]] (already sharded — no global sort
    * task) → `repartitionByRange(nFiles, pos)` (pos is the dense rank
    * 1..n, so ranges are uniform by construction — no skewed file) →
    * `sortWithinPartitions(pos)` → parquet under `{path}/data`; the
    * manifest derives from ONE read-back aggregation keyed by file name
    * (≤ nFiles rows) and lands at `{path}/manifest`.
    *
    * @return the read-back data frame ({idCol}, shuffle_key, pos) —
    *         exactly [[deterministicShuffle]]'s rows (round-trip pinned
    *         by `TrainOrderSpec` and the q156 oracle) */
  def writeOrdered(df: DataFrame, idCol: String, seed: String,
      path: String, nFiles: Int): DataFrame = {
    require(nFiles >= 1, s"need nFiles >= 1, got $nFiles")
    val spark = df.sparkSession
    deterministicShuffle(df, idCol, seed)
      .repartitionByRange(nFiles, col("pos").asc)
      .sortWithinPartitions(col("pos").asc)
      .write.mode("overwrite").parquet(s"$path/data")
    val back = spark.read.parquet(s"$path/data")
    back.groupBy(input_file_name().as("file"))
      .agg(min(col("pos")).as("min_pos"), max(col("pos")).as("max_pos"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("min_pos"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/manifest")
    back
  }
}
