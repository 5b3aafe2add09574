package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-size token-window chunking with stride/overlap — the
  * context-window preprocessing step of an LLM training pipeline: each
  * document fans out into chunks of `chunkSize` tokens taken every
  * `stride` tokens (overlap = chunkSize - stride), the final chunk
  * clipped at the document end.
  *
  * Scale shape: pure per-row fan-out (transform + explode) that stays in
  * the scan stage — no shuffle, no state; chunk counts are exact integer
  * arithmetic so the fan-out is reproducible on any engine/partitioning.
  * Chunk count for n tokens is 1 + ceil(max(n - chunkSize, 0) / stride):
  * every token is covered and a chunk starts at each stride offset while
  * more than `chunkSize` tokens remain.
  */
object Chunking {

  /** Exploded chunk rows: (doc_id, chunk_idx, n_chunk_tokens, chunk_text).
    * `chunk_idx` counts from 0; token index i of chunk c is c·stride + i.
    */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize >= 1 && stride >= 1 && stride <= chunkSize,
      s"need 1 <= stride <= chunkSize, got chunkSize=$chunkSize stride=$stride")
    val toks = TextAnalysis.tokens(col(textCol))
    val n = size(toks)
    // ceil((n - chunkSize) / stride) + 1; the truncating cast equals
    // integer division for these positive magnitudes. A sequence() guard
    // is unnecessary because nChunks >= 1 always (split("") yields [""],
    // so n >= 1).
    val nChunks = when(n <= chunkSize, lit(1))
      .otherwise((n - chunkSize + stride - 1).divide(lit(stride)).cast("int") + 1)
    df.select(
      col(idCol).as("doc_id"),
      toks.as("toks"),
      explode(sequence(lit(0), nChunks - 1)).as("chunk_idx"))
      .select(
        col("doc_id"),
        col("chunk_idx"),
        least(lit(chunkSize), size(col("toks")) - col("chunk_idx") * stride)
          .cast("long").as("n_chunk_tokens"),
        concat_ws(" ",
          slice(col("toks"), col("chunk_idx") * stride + 1, lit(chunkSize)))
          .as("chunk_text"))
  }
}
