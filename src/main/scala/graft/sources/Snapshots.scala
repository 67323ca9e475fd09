package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Family-level snapshot log for persisted indexes — the piece that
  * makes "probe the index as it was BEFORE the last maintenance op"
  * well-defined (time travel, the Delta/Iceberg capability adapted to
  * the [[Generations]] catalog).
  *
  * WHY a family log: each member table (postings/dfs/bounds/deletes …)
  * flips generations independently, and different maintenance ops bump
  * DIFFERENT members (a delete bumps only `_deletes`; an append bumps
  * dfs+bounds but not postings) — so "step each member back one
  * generation" reconstructs a state that never existed. The log records,
  * per maintenance COMMIT, the generation every member served when the
  * op finished: a consistent family-wide manifest, exactly Delta's
  * commit-log shape at maintenance-op granularity.
  *
  * Storage: `{index}_log`, a tiny append-only parquet table beside the
  * index (one ROW per maintenance commit — a row is one parquet record,
  * so a concurrent reader sees whole manifests only, at worst missing
  * the newest). Writers append under the family maintenance lock, so
  * commit ids are monotonic.
  *
  * REVERTIBILITY: ops whose rewrite lands as fresh generations (build /
  * compact / delete / rebuild) leave the prior state's files intact
  * under the [[Generations]] retention contract — stepping back across
  * them is exact. File-appending ops (BM25 posting append, IVF cell
  * append, MinHash bucketed ingest) mutate the current generation's
  * directory in place — new files only, but a historical reader cannot
  * un-see them — so they are recorded `revertible = false` and
  * [[resolveAsOf]] REFUSES to step across one (loudly, naming the
  * commit) rather than serve a frankenstate. The headline operational
  * use — "a bad takedown/compaction landed; serve yesterday's index
  * while we fix it" — steps across delete/compact commits, which are
  * always revertible.
  *
  * RETENTION bound: [[Generations]] keeps one superseded generation per
  * member (until the next commit on that member), so `back = 1` is
  * always servable and deeper history is servable until a member's
  * generation is retired — [[resolveAsOf]] verifies every member table
  * still exists and otherwise names the retired one (the Delta VACUUM
  * trade, surfaced as an error instead of a partial read).
  */
object Snapshots {

  def logTable(index: String): String = s"${index}_log"

  private def exists(spark: SparkSession, name: String): Boolean =
    spark.sessionState.catalog.tableExists(
      org.apache.spark.sql.catalyst.TableIdentifier(name))

  /** The sibling `log` directory of an existing index member's
    * location (generation suffixes stripped — same convention as the
    * tombstone list). */
  private def pathBeside(spark: SparkSession, anchorTable: String): String = {
    val loc = Generations.location(spark, anchorTable)
      .replaceAll("__g\\d+$", "")
    new org.apache.hadoop.fs.Path(loc).getParent.toString + "/log"
  }

  /** Append one commit manifest: the CURRENT generation of every member
    * live name, stamped with the next monotonic commit id. Call at the
    * END of a maintenance op, inside its family lock (ids stay
    * monotonic; the append is one tiny parquet file). Members that do
    * not exist (e.g. `_deletes` on a legacy index) are recorded with an
    * empty gen and skipped at resolve time. */
  def record(spark: SparkSession, index: String, op: String,
      revertible: Boolean, members: Seq[String], anchorTable: String): Unit = {
    import spark.implicits._
    val live = logTable(index)
    val nextId: Long =
      if (!exists(spark, live)) 0L
      else {
        spark.catalog.refreshTable(live)
        spark.table(live).agg(max($"commit_id")).head() match {
          case r if r.isNullAt(0) => 0L
          case r => r.getLong(0) + 1L
        }
      }
    val manifest = members.map { m =>
      (m, Generations.currentOpt(spark, m).getOrElse(""))
    }
    val row = Seq((nextId, op, revertible, manifest))
      .toDF("commit_id", "op", "revertible", "members")
    if (!exists(spark, live))
      row.coalesce(1).write.format("parquet")
        .option("path", pathBeside(spark, anchorTable))
        .saveAsTable(live)
    else
      row.coalesce(1).write.format("parquet").mode("append")
        .saveAsTable(live)
  }

  /** The full commit history, newest first — the operator's audit view:
    * (commit_id, op, revertible, members[(name, gen)]). */
  def history(spark: SparkSession, index: String): DataFrame = {
    val live = logTable(index)
    require(exists(spark, live),
      s"index $index has no snapshot log ($live) — it predates the " +
        "snapshot-log format; rebuild it to enable time travel")
    spark.catalog.refreshTable(live)
    spark.table(live).orderBy(col("commit_id").desc)
  }

  /** Resolve every member live name to the generation table it served
    * `back` maintenance commits ago (back = 0 resolves the newest
    * manifest — equivalent to reading the live names, useful for a
    * pinned repeatable read). Throws when:
    *  - the index has no snapshot log (predates the format),
    *  - the history is shorter than `back`,
    *  - a commit being stepped ACROSS is non-revertible (in-place file
    *    append — the prior state is not reconstructable),
    *  - a resolved generation table was already retired (retention).
    */
  def resolveAsOf(spark: SparkSession, index: String,
      back: Int): Map[String, String] = {
    require(back >= 0, s"need back >= 0, got $back")
    val commits = history(spark, index)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2),
        r.getSeq[org.apache.spark.sql.Row](3)
          .map(m => (m.getString(0), m.getString(1)))))
    require(commits.length > back,
      s"index $index has ${commits.length} recorded maintenance commits — " +
        s"cannot step back $back")
    val crossed = commits.take(back)
    crossed.find(!_._3).foreach { c =>
      throw new IllegalStateException(
        s"cannot time-travel across commit ${c._1} (op '${c._2}') on " +
          s"index $index: it appended files into a live generation in " +
          "place, so the prior state is not reconstructable — snapshots " +
          "older than it are only servable up to that commit")
    }
    val target = commits(back)
    target._4.filter(_._2.nonEmpty).map { case (live, gen) =>
      if (!exists(spark, gen))
        throw new IllegalStateException(
          s"snapshot commit ${target._1} of index $index references " +
            s"generation $gen of $live, which has been retired " +
            "(retention keeps one superseded generation per member; " +
            "vacuum or later maintenance reclaimed this one)")
      live -> gen
    }.toMap
  }
}
