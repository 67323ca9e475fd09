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
  * At 100 TB the output is typically written bucketed/sorted by `pos`
  * ranges so the loader streams slices in order without another sort.
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
}
