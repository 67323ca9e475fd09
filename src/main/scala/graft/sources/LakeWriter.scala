package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Compacted lake writes: the small-files killer at 100 TB.
  *
  * A naive `df.write.partitionBy(k).parquet(path)` emits one file per
  * (task × partition-value) — 1000 executors × 5 values = 5000 files per
  * batch, and a day of batches turns the listing itself into the
  * bottleneck. `writeCompacted` first clusters rows by the partition
  * columns (one shuffle), so each partition value is written by a single
  * task, then lets `maxRecordsPerFile` split output into bounded-size
  * files: the file count per directory becomes ⌈rows/maxRecordsPerFile⌉
  * regardless of input parallelism. `sortCols` orders rows within each
  * file so parquet row-group min/max stats support data skipping on
  * those columns. Pinned by `LakeSpec` (exact per-directory file counts
  * + lossless round-trip).
  */
object LakeWriter {

  def writeCompacted(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      maxRecordsPerFile: Long,
      sortCols: Seq[String] = Nil): Unit = {
    val clustered = df.repartition(partitionCols.map(col): _*)
    val sorted =
      if (sortCols.isEmpty) clustered
      else clustered.sortWithinPartitions(
        (partitionCols ++ sortCols).map(col): _*)
    sorted.write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .parquet(path)
  }
}
