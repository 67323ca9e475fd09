package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage staging for iterative / multi-consumer operators.
  *
  * Iterative plans (connected components' label frames) and frames
  * consumed by two downstream aggregates (quantile slices, CCNet's
  * scored corpus) must be materialized once with their lineage cut —
  * otherwise Catalyst replans the whole upstream per iteration /
  * consumer and the plan tree grows exponentially.
  *
  * HOW the cut happens matters at cluster scale:
  *  - `localCheckpoint` stores blocks on executors. Fast, but an
  *    executor loss makes the cached partitions unrecoverable (the
  *    lineage was discarded) and the JOB FAILS — acceptable on
  *    `local[n]`, not on a 1000-executor run where preemption is
  *    routine.
  *  - `checkpoint` writes to the SparkContext's checkpoint directory
  *    (HDFS/S3 on a cluster) — partitions are re-readable after any
  *    executor death.
  *
  * [[cut]] picks automatically: reliable `checkpoint` whenever the
  * session has a checkpoint dir configured
  * (`spark.sparkContext.setCheckpointDir(...)` — do this on real
  * clusters), `localCheckpoint` otherwise. Results are identical
  * either way (pinned in `DedupSpec`); only the fault-tolerance story
  * changes.
  */
object Stage {

  /** Materialize `df` eagerly and return a lineage-free frame —
    * reliable (checkpoint-dir) when the session has one, executor-local
    * otherwise. */
  def cut(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)
}
