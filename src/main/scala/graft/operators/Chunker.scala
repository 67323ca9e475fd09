package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * stride⌋ + 1 for n ≥ 1 — every token is covered, the last window may
  * be short, and stride < chunkLen yields overlapping windows. An EMPTY
  * document (0 tokens) emits 0 chunks (fixed round 11 — the previous
  * contract emitted one chunk holding one empty token, the
  * `split(trim(''))` artifact).
  *
  * 100 TB shape: the whole operator is ONE shuffle-free map pass —
  * tokens are staged as a real projection column (the round-4 staging
  * lesson), the chunk index comes from a codegen `sequence` explode,
  * and each chunk is a post-explode `slice` projection. Nothing is
  * keyed, nothing aggregates; output size is input tokens × overlap
  * factor. [[strideChunks]] chunks whitespace tokens (`split(trim(t),
  * "\s+")`, the q64 DuckDB-parity contract); [[strideChunksOf]] chunks
  * ANY array column — e.g. the BPE token-id arrays of
  * [[Bpe.tokenIdsCol]] (q147) — with identical window algebra.
  */
object Chunker {

  /** Chunk an arbitrary array column. Input `df` must carry `idCol` and
    * the array column `arrCol` (any element type).
    *
    * @return (idCol, chunk_id, start_tok, n_toks, chunk) — one row per
    *         window, chunk_id 0-based, start_tok 1-based, `chunk` the
    *         sliced sub-array; 0-element arrays (and null) emit 0 rows. */
  def strideChunksOf(df: DataFrame, idCol: String, arrCol: String,
      chunkLen: Int, stride: Int): DataFrame = {
    require(chunkLen >= 1, s"chunkLen must be >= 1, got $chunkLen")
    require(stride >= 1 && stride <= chunkLen,
      s"stride must be in [1, chunkLen], got $stride (chunkLen $chunkLen)")
    val staged = df.select(col(idCol), col(arrCol).as("__ts"),
      coalesce(size(col(arrCol)), lit(0)).cast("long").as("__n"))
    val lastChunk = // ⌊(max(n − len, 0) + stride − 1) div stride⌋, 0-based
      expr(s"(greatest(__n - $chunkLen, 0L) + ${stride - 1}L) div ${stride}L")
    staged
      .select(col(idCol), col("__ts"), col("__n"),
        explode(when(col("__n") === 0L, array().cast("array<bigint>"))
          .otherwise(sequence(lit(0L), lastChunk))).as("chunk_id"))
      .withColumn("start_tok", col("chunk_id") * stride + 1L)
      .withColumn("chunk",
        slice(col("__ts"), col("start_tok").cast("int"), lit(chunkLen)))
      .select(col(idCol), col("chunk_id"), col("start_tok"),
        size(col("chunk")).cast("long").as("n_toks"), col("chunk"))
  }

  /** Per-document digest of the FULL window set [[strideChunksOf]] would
    * emit, computed without the explode: one shuffle-free map pass whose
    * output is one bounded row per document — the oracle-friendly form
    * for non-SQL-expressible token spaces (q147 runs it over BPE id
    * arrays).
    *
    * `chunks_md5` = md5 of the `|`-joined per-chunk md5s in chunk order,
    * each chunk hashed as its `,`-joined elements cast to string — so
    * every window's exact content is pinned bit-for-bit by one hex
    * column. Empty arrays digest as md5("") with 0 chunks.
    *
    * @return (idCol, n_items, n_chunks, chunks_md5) */
  def strideChunkDigest(df: DataFrame, idCol: String, arrCol: String,
      chunkLen: Int, stride: Int): DataFrame = {
    require(chunkLen >= 1, s"chunkLen must be >= 1, got $chunkLen")
    require(stride >= 1 && stride <= chunkLen,
      s"stride must be in [1, chunkLen], got $stride (chunkLen $chunkLen)")
    val staged = df.select(col(idCol), col(arrCol).as("__ts"),
      coalesce(size(col(arrCol)), lit(0)).cast("long").as("n_items"))
    val lastChunk =
      expr(s"(greatest(n_items - $chunkLen, 0L) + ${stride - 1}L) div ${stride}L")
    val chunkMd5s = transform(
      when(col("n_items") === 0L, array().cast("array<bigint>"))
        .otherwise(sequence(lit(0L), lastChunk)),
      i => md5(array_join(
        transform(slice(col("__ts"), (i * stride + 1L).cast("int"), lit(chunkLen)),
          x => x.cast("string")),
        ",").cast("binary")))
    staged
      .select(col(idCol), col("n_items"),
        when(col("n_items") === 0L, 0L).otherwise(lastChunk + 1L).as("n_chunks"),
        md5(array_join(chunkMd5s, "|").cast("binary")).as("chunks_md5"))
  }

  /** Whitespace-token chunking of a text column (the q146 shape).
    *
    * @return (idCol, chunk_id, start_tok, n_toks, chunk_text) — one row
    *         per window; empty/null text emits 0 rows. */
  def strideChunks(df: DataFrame, idCol: String, textCol: String,
      chunkLen: Int, stride: Int): DataFrame = {
    val trimmed = trim(coalesce(col(textCol), lit("")))
    val ts: Column = when(trimmed === "", array().cast("array<string>"))
      .otherwise(split(trimmed, "\\s+"))
    strideChunksOf(df.select(col(idCol), ts.as("__arr")), idCol, "__arr",
        chunkLen, stride)
      .withColumn("chunk_text", array_join(col("chunk"), " "))
      .drop("chunk")
  }
}
