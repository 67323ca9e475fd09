package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout: the 100 TB lever that removes the shuffle from
  * repeated joins/aggregations on a stable key.
  *
  * Writing a fact table `bucketBy(n, key)` pre-hash-partitions it ON DISK:
  * every subsequent join or aggregation keyed on `key` against another
  * table bucketed the same way satisfies Catalyst's required
  * `HashClusteredDistribution` straight from the scan, so the physical
  * plan has NO `Exchange hashpartitioning` — at 100 TB that is the
  * difference between re-shuffling the whole fact table per query and
  * reading co-located buckets. `sortBy` additionally persists sort order
  * within each bucket so sort-merge join can skip its sort.
  *
  * The reference engine gets the equivalent for free on a single node
  * (everything is local); on a cluster the layout has to be declared at
  * write time, which is what this helper does. Pinned by `BucketingSpec`
  * (plan has a SortMergeJoin and zero hash-partition exchanges) and
  * oracle-checked end-to-end as q84 (bucketed round-trip is lossless).
  */
object Bucketing {

  /** Write `df` as an external parquet table bucketed (and sorted) by
    * `keys`, replacing any previous registration of `table`. The data
    * lands under `path`; only metadata lives in the session catalog.
    */
  def writeBucketed(
      spark: SparkSession,
      df: DataFrame,
      table: String,
      path: String,
      numBuckets: Int,
      keys: Seq[String]): DataFrame = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.write
      .format("parquet")
      .option("path", path)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("overwrite")
      .saveAsTable(table)
    spark.table(table)
  }

  /** Append `df` to an EXISTING bucketed table from [[writeBucketed]],
    * preserving its layout: the bucket spec (count + keys + sort) is read
    * from the catalog and re-declared on the write, so the new files are
    * hash-partitioned and sorted exactly like the old ones and every
    * downstream exchange-free join/aggregation property survives the
    * append. This is the daily-ingest growth path for persisted indexes
    * (MinHash signature/band tables, posting lists): a batch-sized write,
    * never a rewrite of the accumulated table.
    */
  def appendBucketed(spark: SparkSession, df: DataFrame, table: String): DataFrame = {
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    val spec = meta.bucketSpec.getOrElse(throw new IllegalArgumentException(
      s"table $table has no bucket spec — appendBucketed only grows " +
        "tables written by writeBucketed"))
    df.write
      .format("parquet")
      .bucketBy(spec.numBuckets,
        spec.bucketColumnNames.head, spec.bucketColumnNames.tail: _*)
      .sortBy(spec.sortColumnNames.head, spec.sortColumnNames.tail: _*)
      .mode("append")
      .saveAsTable(table)
    spark.table(table)
  }

  /** Compact a [[writeBucketed]] table after [[appendBucketed]] batches —
    * every append adds its own file-set per bucket (each write task emits
    * one file per bucket it touches), so after N daily batches a bucket
    * scan reads N+ files and the in-file sort order holds only per batch.
    * This rewrites the table as ONE fresh generation with exactly one
    * file per bucket (the pre-write `repartition(numBuckets, keys)` uses
    * the same murmur3 `HashPartitioning` the bucketizer uses, so each
    * bucket's rows land whole in one task) and globally sorted within it,
    * then swaps the live name and deletes the old generation — the
    * write-new / swap / delete-old contract and crash-safety story of
    * [[Generations]]. Pure layout maintenance: rows are untouched, so
    * probe equality before/after IS the correctness check (spec-pinned;
    * the q162 MinHash-index query shares its oracle with the uncompacted
    * replay). Outstanding DataFrames planned against the old generation
    * are invalidated by the final delete — re-derive from the table name.
    */
  def compactBucketed(spark: SparkSession, table: String): Unit = {
    import org.apache.spark.sql.functions.col
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    val spec = meta.bucketSpec.getOrElse(throw new IllegalArgumentException(
      s"table $table has no bucket spec — compactBucketed only serves " +
        "tables written by writeBucketed"))
    val old = meta.location.toString
    val nextPath = Generations.next(old)
    val tmp = Generations.compactingName(table)
    spark.sql(s"DROP TABLE IF EXISTS $tmp")
    // read by PATH, not by table name: the rewrite must not depend on the
    // registration it is about to replace, and the live name keeps
    // serving the old generation until the swap below
    val writer = spark.read.parquet(old)
      .repartition(spec.numBuckets, spec.bucketColumnNames.map(col): _*)
      .write
      .format("parquet")
      .option("path", nextPath)
      .bucketBy(spec.numBuckets,
        spec.bucketColumnNames.head, spec.bucketColumnNames.tail: _*)
    (if (spec.sortColumnNames.nonEmpty)
       writer.sortBy(spec.sortColumnNames.head, spec.sortColumnNames.tail: _*)
     else writer)
      .mode("overwrite").saveAsTable(tmp)
    Generations.renameSwap(spark, tmp, table)
    Generations.delete(spark, old)
  }
}
