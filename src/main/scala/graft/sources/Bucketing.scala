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
  *
  * Tables here live under the [[Generations]] contract: the public name
  * is a live VIEW over the current generation TABLE, so compaction's
  * swap is one atomic catalog op and the superseded generation survives
  * until the next commit for in-flight readers. Bucket properties pass
  * through the view untouched — the physical scan node takes its
  * `outputPartitioning` from the underlying relation's bucket spec, so
  * the exchange-free join shape is independent of the indirection
  * (spec-pinned).
  */
object Bucketing {

  /** Write `df` as the initial generation of a bucketed (and sorted)
    * external parquet table and point the live view `table` at it,
    * replacing any previous registration. The data lands under `path`;
    * only metadata lives in the session catalog. */
  def writeBucketed(
      spark: SparkSession,
      df: DataFrame,
      table: String,
      path: String,
      numBuckets: Int,
      keys: Seq[String]): DataFrame =
      Generations.withMaintenanceLock(Generations.familyOf(table)) {
    val base = Generations.currentOpt(spark, table)
    val gen = Generations.reserve(spark, table)
    df.write
      .format("parquet")
      .option("path", Generations.genPath(path, gen))
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("overwrite")
      .saveAsTable(gen)
    Generations.commit(spark, table, gen, base)
    spark.table(table)
  }

  /** The current generation's catalog metadata (bucket spec, location)
    * — resolved through the live view. */
  private def genMeta(spark: SparkSession, table: String) = {
    val gen = Generations.ensureGen(spark, table)
    (gen, spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(gen)))
  }

  /** Append `df` to an EXISTING bucketed table from [[writeBucketed]],
    * preserving its layout: the bucket spec (count + keys + sort) is read
    * from the catalog and re-declared on the write, so the new files are
    * hash-partitioned and sorted exactly like the old ones and every
    * downstream exchange-free join/aggregation property survives the
    * append. This is the daily-ingest growth path for persisted indexes
    * (MinHash signature/band tables, posting lists): a batch-sized write,
    * never a rewrite of the accumulated table. Appends target the
    * CURRENT generation in place — new files only, never a rewrite of
    * files a reader holds — so they need no generation flip.
    *
    * STAGED (r16): the batch writes to a sibling staging table with the
    * same bucket spec, then its files MOVE into the live generation
    * directory (pure renames — bucketed-read bucket ids ride the file
    * NAME's `_0000N` tag, which the rename preserves, so the
    * exchange-free join shape survives; spec-pinned). A crash during
    * the write leaves the index unchanged; the [[StagedAppend]]
    * rationale. Returns the generation-relative names of the files
    * added — the `addedFiles` input of [[Snapshots.record]], so an
    * ingest commit's file delta is recorded with zero directory walks.
    */
  def appendBucketed(spark: SparkSession, df: DataFrame,
      table: String): Seq[String] =
      Generations.withMaintenanceLock(Generations.familyOf(table)) {
    val m = stageBucketed(spark, df, table)
    try {
      val destRoot = new org.apache.hadoop.fs.Path(
        Generations.location(spark, m.gen))
      val fs = destRoot.getFileSystem(spark.sessionState.newHadoopConf())
      m.files.foreach { rel =>
        val src = new org.apache.hadoop.fs.Path(
          new org.apache.hadoop.fs.Path(m.stage), rel)
        val dest = new org.apache.hadoop.fs.Path(destRoot, rel)
        if (!fs.rename(src, dest))
          require(fs.exists(dest),
            s"bucketed staged append: rename $src -> $dest failed")
      }
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${m.stageTbl}")
      val p = new org.apache.hadoop.fs.Path(m.stage)
      p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    }
    spark.catalog.refreshTable(m.gen)
    m.files
  }

  /** STAGE HALF of [[appendBucketed]] (r17 — the [[PendingAppend]]
    * split, mirroring [[StagedAppend.stage]]): write `df` with the
    * destination's exact bucket spec into a sibling staging table and
    * return the staged member descriptor; the live table is untouched
    * until the caller (under its pending sidecar) moves the files in.
    * Bucketed-read bucket ids ride the file NAME's `_0000N` tag, which
    * the later rename preserves — the exchange-free join shape
    * survives (spec-pinned by the whole MinHash suite). A write
    * FAILURE cleans the stage and rethrows; a JVM death leaves an
    * orphan stage for [[PendingAppend.recover]]'s sweep. */
  def stageBucketed(spark: SparkSession, df: DataFrame,
      table: String): PendingAppend.StagedMember = {
    val (gen, meta) = genMeta(spark, table)
    val spec = meta.bucketSpec.getOrElse(throw new IllegalArgumentException(
      s"table $table has no bucket spec — appendBucketed only grows " +
        "tables written by writeBucketed"))
    val destRoot = new org.apache.hadoop.fs.Path(meta.location.toString)
    val fs = destRoot.getFileSystem(spark.sessionState.newHadoopConf())
    val tag = "__stage" + java.util.UUID.randomUUID().toString
      .replace("-", "").take(8)
    val stageTbl = gen + tag
    val stagePath = new org.apache.hadoop.fs.Path(destRoot.toString + tag)
    val files = scala.collection.mutable.ArrayBuffer.empty[String]
    try {
      val writer = df.write.format("parquet")
        .option("path", stagePath.toString)
        .bucketBy(spec.numBuckets,
          spec.bucketColumnNames.head, spec.bucketColumnNames.tail: _*)
      (if (spec.sortColumnNames.nonEmpty)
         writer.sortBy(spec.sortColumnNames.head,
           spec.sortColumnNames.tail: _*)
       else writer)
        .mode("overwrite").saveAsTable(stageTbl)
      fs.listStatus(stagePath)
        .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
          !f.getPath.getName.startsWith("."))
        .foreach(f => files += f.getPath.getName)
    } catch {
      case e: Throwable =>
        spark.sql(s"DROP TABLE IF EXISTS $stageTbl")
        fs.delete(stagePath, true)
        throw e
    }
    PendingAppend.StagedMember(table, gen, "bucketed", stagePath.toString,
      files.toSeq.sorted, stageTbl)
  }

  /** Compact a [[writeBucketed]] table after [[appendBucketed]] batches —
    * every append adds its own file-set per bucket (each write task emits
    * one file per bucket it touches), so after N daily batches a bucket
    * scan reads N+ files and the in-file sort order holds only per batch.
    * This rewrites the table as ONE fresh generation with exactly one
    * file per bucket (the pre-write `repartition(numBuckets, keys)` uses
    * the same murmur3 `HashPartitioning` the bucketizer uses, so each
    * bucket's rows land whole in one task) and globally sorted within it,
    * then flips the live view onto it — one atomic catalog op — and
    * retires generations older than the one just superseded (the
    * [[Generations]] retention contract: probes planned before the flip
    * keep their files until the NEXT maintenance commit). Pure layout
    * maintenance by default: rows are untouched, so probe equality
    * before/after IS the correctness check (spec-pinned; the q162
    * MinHash-index query shares its oracle with the uncompacted replay).
    *
    * `fold` lets a caller piggyback a row filter on the rewrite —
    * [[graft.operators.Dedup.compactMinhashIndex]] folds its delete
    * tombstones here, dropping the dead rows physically inside the
    * rewrite compaction was doing anyway.
    */
  def compactBucketed(spark: SparkSession, table: String,
      fold: DataFrame => DataFrame = identity): Unit =
      Generations.withMaintenanceLock(Generations.familyOf(table)) {
    import org.apache.spark.sql.functions.col
    val (gen, meta) = genMeta(spark, table)
    val spec = meta.bucketSpec.getOrElse(throw new IllegalArgumentException(
      s"table $table has no bucket spec — compactBucketed only serves " +
        "tables written by writeBucketed"))
    val old = meta.location.toString
    val nextGen = Generations.reserve(spark, table)
    // read by PATH, not by name: the rewrite must not depend on the
    // registration it supersedes, and the live view keeps serving the
    // old generation until the commit below
    val writer = fold(spark.read.parquet(old))
      .repartition(spec.numBuckets, spec.bucketColumnNames.map(col): _*)
      .write
      .format("parquet")
      .option("path",
        Generations.genPath(old.replaceAll("__g\\d+$", ""), nextGen))
      .bucketBy(spec.numBuckets,
        spec.bucketColumnNames.head, spec.bucketColumnNames.tail: _*)
    (if (spec.sortColumnNames.nonEmpty)
       writer.sortBy(spec.sortColumnNames.head, spec.sortColumnNames.tail: _*)
     else writer)
      .mode("overwrite").saveAsTable(nextGen)
    // atomic flip, CAS'd on the generation the rewrite read; the
    // superseded generation is retained for in-flight readers until the
    // next maintenance commit
    Generations.commit(spark, table, nextGen, Some(gen))
  }
}
