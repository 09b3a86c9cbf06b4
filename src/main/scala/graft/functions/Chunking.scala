package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking: split token streams into overlapping fixed-size
  * windows (the context-length-bound segmentation step between cleaning and
  * shard packing in a pre-training pipeline; also the retrieval-chunking
  * step of a RAG corpus build). Extension scope — no reference counterpart.
  *
  * Pure dataflow: chunk starts are generated per row with `sequence` and
  * exploded — no UDF, no driver state, parallel in the documents. Output
  * rows ≈ input tokens / (chunkSize - overlap), linear in corpus size.
  */
object Chunking {

  /** One row per (doc, chunk): `chunk_idx` (0-based), `chunk_text` (tokens
    * re-joined with single spaces), `chunk_tokens` (window length; only the
    * final chunk of a doc may be shorter). Chunk starts advance by
    * `chunkSize - overlap`; a start is generated while it lies at or before
    * size-overlap, so a doc never ends with a window containing only
    * already-emitted tokens. Docs shorter than one window yield exactly one
    * chunk with everything they have; empty token arrays yield one empty
    * chunk (filter upstream if unwanted).
    */
  def chunkTokens(df: DataFrame, idCol: String, toks: Column,
      chunkSize: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && chunkSize > overlap,
      s"need 0 <= overlap < chunkSize: chunkSize=$chunkSize overlap=$overlap")
    val step = chunkSize - overlap
    val bound = df.select(col(idCol), toks.as("__toks"))
    val starts = sequence(lit(1),
      greatest(size(col("__toks")) - overlap, lit(1)), lit(step))
    bound
      .select(col(idCol),
        posexplode(transform(starts, i => slice(col("__toks"), i, lit(chunkSize)))))
      .select(col(idCol), col("pos").as("chunk_idx"),
        concat_ws(" ", col("col")).as("chunk_text"),
        size(col("col")).as("chunk_tokens"))
  }
}
