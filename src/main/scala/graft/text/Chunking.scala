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
    * Null-text documents produce NO chunks (they are filtered before the
    * fan-out — without the guard, Spark's legacy `size(null) = -1` would
    * feed the chunk-count arithmetic garbage instead of propagating
    * null).
    */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize >= 1 && stride >= 1 && stride <= chunkSize,
      s"need 1 <= stride <= chunkSize, got chunkSize=$chunkSize stride=$stride")
    val df2 = df.where(col(textCol).isNotNull)
    val toks = TextAnalysis.tokens(col(textCol))
    val n = size(toks)
    // ceil((n - chunkSize) / stride) + 1; the truncating cast equals
    // integer division for these positive magnitudes. A sequence() guard
    // is unnecessary because nChunks >= 1 always (split("") yields [""],
    // so n >= 1).
    val nChunks = when(n <= chunkSize, lit(1))
      .otherwise((n - chunkSize + stride - 1).divide(lit(stride)).cast("int") + 1)
    df2.select(
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

  /** Context-length planning sweep — the sizing decision BEFORE chunking
    * or packing runs: for each candidate context length, the corpus-wide
    * chunk count and padding waste IF every doc were chunked
    * non-overlapping at that length and each final chunk padded to it.
    * The fill fraction (tokens / padded capacity) is what a training-
    * batch engineer reads off to pick max_len; [[Packing.fillStats]]
    * then measures what greedy packing actually achieves at the chosen
    * length.
    *
    * Scale shape: one scan of the corpus with a |candidates|-way literal
    * fan-out (scan-stage, data-independent), then one aggregate over
    * |candidates| groups with map-side partials. All counts are exact
    * integer arithmetic; the fill fraction is a single division of two
    * exact sums, so the report is partitioning-independent. Null-text
    * documents are excluded (same guard and rationale as [[chunk]] —
    * `size(tokens(null))` is -1 under Spark's legacy sizeOfNull, which
    * would silently poison every sum it reaches).
    */
  def planSweep(df: DataFrame, textCol: String,
      candidates: Seq[Int]): DataFrame = {
    require(candidates.nonEmpty && candidates.forall(_ >= 1),
      s"candidate lengths must be >= 1: $candidates")
    val n = size(TextAnalysis.tokens(col(textCol))).cast("long")
    df.where(col(textCol).isNotNull).select(n.as("n_tokens"))
      .select(col("n_tokens"),
        explode(array(candidates.map(c => lit(c.toLong)): _*)).as("max_len"))
      .withColumn("n_chunks",
        expr("(n_tokens + max_len - 1) div max_len"))
      .groupBy("max_len")
      .agg(
        count(lit(1)).as("docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("n_chunks")).as("total_chunks"),
        sum(col("n_chunks") * col("max_len") - col("n_tokens"))
          .as("total_padding"))
      .withColumn("fill_frac",
        col("total_tokens").cast("double") /
          (col("total_chunks") * col("max_len")))
  }
}
