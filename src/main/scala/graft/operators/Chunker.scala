package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — split each document's token stream
  * into fixed-length, optionally overlapping windows: the standard prep
  * step for embedding / retrieval pipelines (context windows with
  * stride) and for chunked eval sets. Complements [[Packing]]: packing
  * CONCATENATES docs up to a context length, chunking SPLITS docs down
  * to one.
  *
  * Chunk i (0-based) of a doc covers 1-based token positions
  * [i·stride + 1, i·stride + chunkLen], clamped at the document end;
  * the number of chunks is ⌊(max(n − chunkLen, 0) + stride − 1) /
  * stride⌋ + 1 — every token is covered, the last window may be short,
  * and stride < chunkLen yields overlapping windows.
  *
  * 100 TB shape: the whole operator is ONE shuffle-free map pass —
  * tokens are staged as a real projection column (the round-4 staging
  * lesson), the chunk index comes from a codegen `sequence` explode,
  * and each chunk is a post-explode `slice` projection. Nothing is
  * keyed, nothing aggregates; output size is input tokens × overlap
  * factor. Token space is whitespace-split (`split(trim(t), "\s+")`,
  * the q64 DuckDB-parity contract), so every output column is
  * oracle-expressible in plain SQL.
  */
object Chunker {

  /** @return (idCol, chunk_id, start_tok, n_toks, chunk_text) — one row
    *         per window, chunk_id 0-based, start_tok 1-based. */
  def strideChunks(df: DataFrame, idCol: String, textCol: String,
      chunkLen: Int, stride: Int): DataFrame = {
    require(chunkLen >= 1, s"chunkLen must be >= 1, got $chunkLen")
    require(stride >= 1 && stride <= chunkLen,
      s"stride must be in [1, chunkLen], got $stride (chunkLen $chunkLen)")
    val ts = split(trim(coalesce(col(textCol), lit(""))), "\\s+")
    val staged = df.select(col(idCol), ts.as("__ts"),
      size(ts).cast("long").as("__n"))
    val lastChunk = // ⌊(max(n − len, 0) + stride − 1) div stride⌋, 0-based
      expr(s"(greatest(__n - $chunkLen, 0L) + ${stride - 1}L) div ${stride}L")
    staged
      .select(col(idCol), col("__ts"), col("__n"),
        explode(sequence(lit(0L), lastChunk)).as("chunk_id"))
      .withColumn("start_tok", col("chunk_id") * stride + 1L)
      .withColumn("__chunk",
        slice(col("__ts"), col("start_tok").cast("int"), lit(chunkLen)))
      .select(col(idCol), col("chunk_id"), col("start_tok"),
        size(col("__chunk")).cast("long").as("n_toks"),
        array_join(col("__chunk"), " ").as("chunk_text"))
  }
}
