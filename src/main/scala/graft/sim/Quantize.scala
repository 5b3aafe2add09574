package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Symmetric per-vector int8 quantization of float embeddings — the
  * standard storage/shuffle shrink for ANN at scale: 4× smaller vectors
  * (64 B instead of 256 B per 64-dim vector) with the per-vector scale
  * kept alongside, so candidate generation and distance scoring can run
  * over the quantized form and only re-rank survivors on full floats.
  *
  * Quantization is floor-based (q_i = floor(x_i · 127 / max|x|)) rather
  * than round-based: floor of an exact integral double is reproducible on
  * every engine, so the whole codebook is bit-portable (the q61 oracle
  * replays it in DuckDB). All-zero vectors quantize to all-zero with
  * scale 0. Like the sketch kernels, this is element-wise math over a
  * ~64-element array; the higher-order-function form is fine at this
  * width (one interpreted lambda per element) — the native-Expression
  * upgrade documented in SketchExprs applies if profiles ever show it hot.
  */
object Quantize {

  /** max|x_i| of a float vector, as double (exact promotions). */
  def maxAbs(vec: Column): Column =
    array_max(transform(vec, x => abs(x))).cast("double")

  /** Per-vector dequantization multiplier: maxAbs / 127. */
  def scaleOf(vec: Column): Column = maxAbs(vec) / 127.0

  /** int8-range codes as array<int>: floor(x·127 / max|x|), in [-127, 127]
    * (all-zero vectors map to all zeros). */
  def quantized(vec: Column): Column = {
    val m = maxAbs(vec)
    transform(vec, x =>
      when(m === 0.0, lit(0L))
        .otherwise(floor(x.cast("double") * 127.0 / m))
        .cast("int"))
  }

  /** Reconstructed doubles q_i · scale (for approximate distance scoring). */
  def dequantized(q: Column, scale: Column): Column =
    transform(q, v => v.cast("double") * scale)

  /** Per-vector quantization profile (q61's shape): dimension count, scale,
    * exact integer sum/min/max of the codes, and the saturated-code count.
    * All-integer aggregates + same-op-order doubles — bit-stable anywhere.
    */
  def stats(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val q = quantized(col(vecCol))
    df.select(
      col(idCol).as("vec_id"),
      size(col(vecCol)).cast("long").as("n_dims"),
      scaleOf(col(vecCol)).as("scale"),
      aggregate(q, lit(0L), (a, x) => a + x).as("q_sum"),
      array_min(q).as("q_min"),
      array_max(q).as("q_max"),
      size(filter(q, v => abs(v) === 127)).cast("long").as("n_sat"))
  }
}
