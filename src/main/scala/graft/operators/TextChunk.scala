package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the preprocessing step every
  * embedding/similarity pipeline runs before [[Similarity]]/[[Ivf]]/
  * [[Pq]]: an embedding model has a context budget, so each document
  * splits into windows of `chunkTokens` whitespace tokens overlapping
  * by `overlapTokens` (the overlap keeps sentences that straddle a
  * boundary retrievable from BOTH sides). Also the retrieval-side twin
  * of [[Pack]]: packing concatenates docs UP TO a budget for training,
  * chunking splits docs DOWN TO a budget for indexing.
  *
  * Chunk layout (the LangChain/retrieval standard): starts at
  * `i · stride` (stride = chunk − overlap), and generation stops with
  * the first chunk whose window reaches the end —
  * `n_chunks = 1 + ⌈max(0, n − chunk) / stride⌉` — so no chunk is
  * fully contained in its predecessor and every token is covered.
  * Zero-token documents yield zero chunks (nothing to embed).
  * Reconstruction is whitespace-normalized (tokens re-join with single
  * spaces) — the embedding-input form, not a byte-faithful slice.
  *
  * Scale shape: one map-only pass — tokenize, size, explode a
  * `sequence` of chunk indices, `slice` per index; no shuffle, no
  * driver state, codegen'd built-ins end to end. Each output row
  * carries one chunk's text, so output bytes ≈ input bytes ×
  * (1 + overlap/stride) — the explicit, bounded duplication factor.
  *
  * Reference anchor: none (no text surface in the reference) —
  * SURVEY §7.5 extension set; oracle `q_text_chunks` restates the
  * tokenization and slice arithmetic exactly in DuckDB.
  */
object TextChunk {

  /** Whitespace tokens with empties dropped (`"a  b"` → 2 tokens,
    * `""`/`"   "` → 0) — matches the oracle's
    * `list_filter(string_split_regex(text, '\s+'), t -> t <> '')`. */
  def wsTokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** Chunk rows `(idCol, chunk_idx, n_tokens, chunk_text)` for every
    * document with ≥ 1 token. */
  def chunks(docs: DataFrame, chunkTokens: Int, overlapTokens: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive: $chunkTokens")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"overlap ($overlapTokens) must be in [0, chunkTokens)")
    val stride = chunkTokens - overlapTokens
    val nChunks = when(col("__n") <= chunkTokens, lit(1))
      .otherwise(lit(1) + ceil((col("__n") - lit(chunkTokens))
        .cast("double") / stride).cast("int"))
    docs
      .select(col(idCol), wsTokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .where(col("__n") > 0)
      .select(col(idCol), col("__toks"), col("__n"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_idx"))
      .select(
        col(idCol),
        col("chunk_idx"),
        least(lit(chunkTokens), col("__n") - col("chunk_idx") * stride)
          .cast("long").as("n_tokens"),
        array_join(slice(col("__toks"),
          col("chunk_idx") * stride + 1, lit(chunkTokens)), " ")
          .as("chunk_text"))
  }
}
