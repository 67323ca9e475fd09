package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining pipelines: documents are concatenated
  * in id order and chunked into fixed-size context windows ("concat then
  * chunk"); each document is assigned the pack its first token lands in.
  *
  * Scale shape: packing is per SHARD (id mod nShards), so the running-sum
  * window parallelizes across shards instead of forcing one global sort —
  * at 100 TB you raise nShards so each shard's window sort fits an
  * executor. Assignment is pure window algebra (one shuffle keyed by
  * shard), deterministic, and engine-mirrorable (q64's DuckDB oracle
  * recomputes every pack id).
  */
object Packing {

  /** @param ctxLen  context window length in tokens
    * @param nShards independent packing streams
    * @return input columns + (shard, pack) — pack is the 0-based chunk
    *         index within the shard where this document starts
    */
  def greedyPack(
      df: DataFrame, idCol: String, tokensCol: String,
      ctxLen: Int, nShards: Int): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard", pmod(col(idCol), lit(nShards.toLong)))
      .withColumn("__cum_end", sum(col(tokensCol)).over(w))
      .withColumn("pack",
        expr(s"(__cum_end - $tokensCol) div $ctxLen"))
      .drop("__cum_end")
  }
}
