package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier

/** Generation-swap machinery shared by every index-compaction /
  * index-rebuild primitive (BM25 postings, MinHash signature/bucket
  * tables, IVF cell directories).
  *
  * The pattern (Lucene segment merge / Delta OPTIMIZE): write the FULL
  * new generation under a temporary table registration first, move the
  * live name onto it only after the write job has committed, then delete
  * the old generation's files. Ordering is the crash-safety story:
  *
  *  - failure DURING the rewrite leaves the live table untouched (old
  *    generation still registered and complete) plus a leftover
  *    `__compacting` temp registration; re-running the compaction drops
  *    and overwrites it — idempotent recovery;
  *  - the swap itself ([[renameSwap]]) is two catalog operations (drop
  *    live name, rename temp onto it). A crash BETWEEN them leaves the
  *    new generation fully written but the live name unregistered —
  *    recover by re-pointing the name at the `__g<N>` path (CREATE
  *    TABLE ... LOCATION) or re-running the build; data files are never
  *    in a half-written state because the swap only happens after the
  *    write commits;
  *  - deleting the old generation is LAST and invalidates outstanding
  *    lazy DataFrames that were planned against it (their file lists
  *    reference deleted paths — re-derive probes from the table name
  *    after any compaction). A probe planned after the swap sees only
  *    the new generation.
  */
object Generations {

  /** Registered location of a catalog table. */
  def location(spark: SparkSession, table: String): String =
    spark.sessionState.catalog
      .getTableMetadata(TableIdentifier(table)).location.toString

  /** Next generation path: `p` → `p__g1` → `p__g2` → … */
  def next(old: String): String =
    if (old.matches(".*__g\\d+$"))
      old.replaceAll("__g(\\d+)$", "") + "__g" +
        (old.replaceAll(".*__g(\\d+)$", "$1").toLong + 1L)
    else old + "__g1"

  /** The temp registration a rewrite targets before the swap. */
  def compactingName(table: String): String = s"${table}__compacting"

  /** Move the live `table` name onto the fully-written `tmp`
    * registration — the LAST step of a rewrite, after the write job
    * commits. External tables keep their location through the rename,
    * so the name simply re-points at the new generation's files. */
  def renameSwap(spark: SparkSession, tmp: String, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
  }

  /** Drop THIS session's cached relation + file listing for each
    * table, so the next read re-lists from disk. Index probes call this
    * on entry: maintenance (append/ingest/compact) may have run in a
    * DIFFERENT session — most commonly a foreachBatch micro-batch
    * clone, whose writes refresh only its own caches — and a stale
    * listing silently serves pre-append files (found by q167's oracle:
    * a streamed BM25 index served only its build-time postings to the
    * outer session). Cost: one re-listing on the next read, which
    * planning pays anyway. */
  def refreshTables(spark: SparkSession, tables: String*): Unit =
    tables.foreach(t => spark.catalog.refreshTable(t))

  /** Recursively delete an old generation's files. */
  def delete(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
  }
}
