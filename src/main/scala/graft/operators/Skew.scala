package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`) splits
  * oversized sort-merge partitions at runtime and is the first line of
  * defense. Salting is for the cases AQE cannot fix: a shuffled hash/merge
  * join where one side must be replicated anyway, or repeated pipelines
  * where the skew is known up front (a handful of hot keys holding >10% of
  * a 100 TB fact table).
  *
  * The salt is derived with `xxhash64` from a caller-supplied
  * distribution column (a unique id), not `rand()` — task retries and
  * speculative execution re-evaluate rows, and a non-deterministic salt
  * would let the same row land in two partitions.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `bigKey === smallKey`, spreading each hot
    * key of the big side over `nSalt` partitions; the small side is
    * replicated `nSalt`× (explode), so choose nSalt ≈ hottest-key-share ×
    * shuffle-partitions, not larger. */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      distributeBy: Column,
      nSalt: Int = 8,
      joinType: String = "inner"): DataFrame = {
    val spark = big.sparkSession
    import spark.implicits._
    val salted = big.withColumn("__salt", pmod(xxhash64(distributeBy), lit(nSalt)).cast("int"))
    val replicated = small.withColumn("__salt", explode(lit((0 until nSalt).toArray)))
    salted.join(replicated,
        salted("__salt") === replicated("__salt") && col(bigKey) === col(smallKey),
        joinType)
      .drop("__salt")
  }

  /** Two-phase aggregation for high-cardinality-per-key combiners (e.g.
    * `collect_set`, exact distinct counts) where map-side combine doesn't
    * shrink hot keys: aggregate (key, salt) first, then merge per key.
    * `partial` and `merge` must form a decomposable aggregate pair. */
  def saltedTwoPhaseAgg(
      df: DataFrame,
      keyCols: Seq[String],
      distributeBy: Column,
      nSalt: Int)(
      partial: Seq[Column],
      merge: Seq[Column]): DataFrame = {
    val spark = df.sparkSession
    df.withColumn("__salt", pmod(xxhash64(distributeBy), lit(nSalt)).cast("int"))
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keyCols.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }
}
