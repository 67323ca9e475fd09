package graft.sources

import org.apache.spark.sql.DataFrame

/** Stage-and-move append into a live generation directory — the shared
  * mechanic behind every in-place index append (BM25 postings pioneered
  * it; IVF cells and the SQ8 replica ride this helper).
  *
  * WHY staging instead of a direct `mode("append")` write:
  *  1. CRASH SAFETY — a failure during the WRITE leaves the live
  *     generation untouched (the stage directory is sibling residue,
  *     reclaimed by the next attempt or deletion); only the rename pass
  *     itself is a partial-visibility window, and renames are
  *     per-file metadata ops — microseconds against the write. A direct
  *     append exposes half-written files to concurrent probes for the
  *     whole write duration.
  *  2. ADD-FILE TRACKING — the rename pass KNOWS exactly which files
  *     the batch added, which is what lets the snapshot log record an
  *     O(batch) `add` delta instead of re-walking the whole generation
  *     directory per commit ([[Snapshots]] r16 contract: append commits
  *     pay zero FS walks).
  *
  * File names carry the write job's UUID, so moved files never collide
  * with resident ones, and a re-run after a crash never double-moves
  * (its stage is a fresh directory).
  */
object StagedAppend {

  /** Append `df` into the current generation of directory-partitioned
    * table `genTable` (layout `partCol=v/part-*.parquet`) via
    * stage-and-move. Returns the generation-relative paths of the files
    * added, sorted — the `addedFiles` input of
    * [[Snapshots.record]]. New partition directories are registered in
    * the shared catalog (RECOVER PARTITIONS); stale listings in OTHER
    * sessions remain the probe's responsibility
    * ([[Generations.refreshTables]]). */
  def partitioned(df: DataFrame, genTable: String,
      partCol: String): Seq[String] = {
    val spark = df.sparkSession
    val destRoot = new org.apache.hadoop.fs.Path(
      Generations.location(spark, genTable))
    val fs = destRoot.getFileSystem(spark.sessionState.newHadoopConf())
    val stage = new org.apache.hadoop.fs.Path(destRoot.toString +
      "__stage" + java.util.UUID.randomUUID().toString.take(8))
    val added = scala.collection.mutable.ArrayBuffer.empty[String]
    try {
      df.write.format("parquet").mode("overwrite")
        .partitionBy(partCol).save(stage.toString)
      fs.listStatus(stage)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith(partCol + "="))
        .foreach { pdir =>
          val dest = new org.apache.hadoop.fs.Path(destRoot,
            pdir.getPath.getName)
          if (!fs.exists(dest)) fs.mkdirs(dest)
          fs.listStatus(pdir.getPath)
            .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
              !f.getPath.getName.startsWith("."))
            .foreach { f =>
              require(fs.rename(f.getPath,
                  new org.apache.hadoop.fs.Path(dest, f.getPath.getName)),
                s"staged append: rename ${f.getPath} -> $dest failed")
              added += s"${pdir.getPath.getName}/${f.getPath.getName}"
            }
        }
    } finally fs.delete(stage, true)
    spark.sql(s"ALTER TABLE $genTable RECOVER PARTITIONS")
    spark.catalog.refreshTable(genTable)
    added.toSeq.sorted
  }
}
