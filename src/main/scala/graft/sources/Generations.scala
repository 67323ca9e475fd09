package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.CatalogTableType

/** Generation machinery shared by every index-maintenance primitive
  * (BM25 postings, MinHash signature/bucket tables, IVF cell
  * directories): the live name every probe reads is a catalog VIEW, and
  * each maintenance rewrite lands as a fresh generation TABLE
  * (`name__gN` over path `path__gN`) that the view is flipped onto.
  *
  * WHY a view (the Lucene segment-merge / Delta-log shape, adapted to
  * Spark's catalog): `CREATE OR REPLACE VIEW` is ONE catalog operation
  * (`alterTable` on the view entry — the catalog serializes it against
  * every concurrent `getTable`), so a reader resolving the live name at
  * ANY instant sees either the old generation or the new one — never a
  * missing name and never a half-swapped table. The previous shape
  * (DROP live + RENAME tmp) had a window between its two catalog ops in
  * which a probe planning `spark.table(live)` failed with
  * TABLE_OR_VIEW_NOT_FOUND; a serving fleet probing during nightly
  * compaction would eventually land in it (`GenerationsSpec` pins the
  * new contract by interleaving probes between every maintenance step
  * of all three index families).
  *
  * RETENTION (what makes the flip safe for in-flight readers): a commit
  * keeps the generation it supersedes — registration AND files — and
  * deletes only generations older than that. A probe that resolved the
  * view just before the flip reads the previous generation's files,
  * which survive until the NEXT maintenance commit; only a reader
  * holding a plan across two whole maintenance cycles can observe
  * deleted files (the standard MVCC-retention contract — Delta's
  * VACUUM window). Disk cost: one superseded generation per table,
  * transient until the next commit (or [[vacuum]]).
  *
  * Crash safety (ordering is the story):
  *  - failure DURING a rewrite leaves the live view untouched (still
  *    pointing at a complete generation) plus a partially-written next
  *    generation; re-running the maintenance overwrites it —
  *    idempotent recovery;
  *  - the flip itself is atomic (one catalog op);
  *  - deleting superseded generations is LAST; a crash before the
  *    deletes only leaves extra files (re-run or [[vacuum]]).
  */
object Generations {

  /** Registered location of a catalog table; a live VIEW resolves
    * through to its current generation table's location. */
  def location(spark: SparkSession, table: String): String = {
    val meta = spark.sessionState.catalog
      .getTableMetadata(TableIdentifier(table))
    if (meta.tableType == CatalogTableType.VIEW)
      location(spark, current(spark, table))
    else meta.location.toString
  }

  /** Next generation path: `p` → `p__g1` → `p__g2` → … */
  def next(old: String): String =
    if (old.matches(".*__g\\d+$"))
      old.replaceAll("__g(\\d+)$", "") + "__g" +
        (old.replaceAll(".*__g(\\d+)$", "$1").toLong + 1L)
    else old + "__g1"

  /** Generation-table name `live__gN`. */
  def genTableName(live: String, n: Long): String = s"${live}__g$n"

  private def genNumber(table: String): Long =
    if (table.matches(".*__g\\d+$"))
      table.replaceAll(".*__g(\\d+)$", "$1").toLong
    else -1L

  private def exists(spark: SparkSession, name: String): Boolean =
    spark.sessionState.catalog.tableExists(TableIdentifier(name))

  private def isView(spark: SparkSession, name: String): Boolean =
    spark.sessionState.catalog.getTableMetadata(TableIdentifier(name))
      .tableType == CatalogTableType.VIEW

  /** The generation TABLE the live name currently serves. Tolerates the
    * pre-generation legacy shape (live name IS a table): returns the
    * name itself, so probes on indexes registered by older builds keep
    * working unchanged. */
  def current(spark: SparkSession, live: String): String = {
    val meta = spark.sessionState.catalog
      .getTableMetadata(TableIdentifier(live))
    if (meta.tableType != CatalogTableType.VIEW) live
    else meta.properties.getOrElse("graft.gen",
      throw new IllegalStateException(
        s"view $live carries no graft.gen property — not a Generations " +
          "live view; rebuild the index"))
  }

  /** Name for the generation a rewrite should target next (the table is
    * not created here — the caller writes it, then [[commit]]s). */
  def nextGenTable(spark: SparkSession, live: String): String =
    if (!exists(spark, live)) genTableName(live, 0L)
    else genTableName(live, genNumber(current(spark, live)) + 1L)

  /** Point the live VIEW at a fully-written generation table — ONE
    * catalog operation (`CREATE OR REPLACE VIEW` alters the existing
    * view entry in place), so concurrent readers of the live name see
    * the old generation or the new one, never a missing name. If the
    * live name is currently a legacy TABLE it is dropped first — the
    * one-time migration window legacy indexes pay (documented; indexes
    * built by this version never re-enter it). */
  def pointAt(spark: SparkSession, live: String, genTable: String): Unit = {
    if (exists(spark, live) && !isView(spark, live))
      spark.sql(s"DROP TABLE IF EXISTS $live")
    spark.sql(s"CREATE OR REPLACE VIEW $live " +
      s"TBLPROPERTIES ('graft.gen' = '$genTable') " +
      s"AS SELECT * FROM $genTable")
  }

  /** Migrate a legacy table-shaped index to the view shape and return
    * its generation table; a no-op (returning [[current]]) when `live`
    * is already a view. The legacy migration is the ONLY remaining
    * two-op window (RENAME then view-create) — paid once per pre-view
    * index, never by indexes this version builds. */
  def ensureGen(spark: SparkSession, live: String): String = {
    if (isView(spark, live)) return current(spark, live)
    val g0 = genTableName(live, 0L)
    spark.sql(s"ALTER TABLE $live RENAME TO $g0")
    pointAt(spark, live, g0)
    g0
  }

  private def listGens(spark: SparkSession, live: String): Seq[String] =
    spark.sessionState.catalog.listTables("default", s"${live}__g*")
      .map(_.table)
      .filter(_.matches(java.util.regex.Pattern.quote(live) + "__g\\d+$"))

  private def retireOne(spark: SparkSession, table: String): Unit = {
    val loc = location(spark, table)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    delete(spark, loc)
  }

  /** Commit a fully-written generation: flip the live view onto it
    * (atomic — see [[pointAt]]) and retire every generation OLDER than
    * the one just superseded. The superseded generation is retained —
    * registration and files — so probes that resolved the view before
    * the flip still collect; it is deleted by the NEXT commit (or an
    * explicit [[vacuum]]). */
  def commit(spark: SparkSession, live: String, newGen: String): Unit = {
    val prev: Option[String] =
      if (exists(spark, live)) Some(current(spark, live)) else None
    pointAt(spark, live, newGen)
    val keep = Set(newGen) ++ prev
    listGens(spark, live).filterNot(keep).foreach(retireOne(spark, _))
  }

  /** Delete every generation except the live one — the explicit
    * reclaim for operators that want the superseded-generation disk
    * back before the next maintenance commit (readers planned before
    * the last flip lose their files; same contract as Delta VACUUM at
    * retention 0). */
  def vacuum(spark: SparkSession, live: String): Unit = {
    val cur = current(spark, live)
    listGens(spark, live).filterNot(_ == cur).foreach(retireOne(spark, _))
  }

  /** Drop THIS session's cached relation + file listing for each live
    * name AND its current generation table, so the next read re-lists
    * from disk. Index probes call this on entry: maintenance
    * (append/ingest/compact) may have run in a DIFFERENT session — most
    * commonly a foreachBatch micro-batch clone, whose writes refresh
    * only its own caches — and a stale listing silently serves
    * pre-append files (found by q167's oracle: a streamed BM25 index
    * served only its build-time postings to the outer session). Cost:
    * one re-listing on the next read, which planning pays anyway. */
  def refreshTables(spark: SparkSession, tables: String*): Unit =
    tables.foreach { t =>
      spark.catalog.refreshTable(t)
      if (exists(spark, t) && isView(spark, t)) {
        val gen = current(spark, t)
        if (exists(spark, gen)) spark.catalog.refreshTable(gen)
      }
    }

  /** Recursively delete an old generation's files. */
  def delete(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
  }
}
