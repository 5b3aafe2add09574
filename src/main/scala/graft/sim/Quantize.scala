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

  /** int8-range codes given a PRE-PROJECTED max|x| column: floor(x·127/m),
    * in [-127, 127] (all-zero vectors map to all zeros). `m` must be an
    * attribute (not an inline maxAbs expression): referenced twice in the
    * per-element lambda, an attribute is a cheap lookup, while an inlined
    * array_max would re-reduce the whole vector per element — O(d²). */
  def quantizedWith(vec: Column, m: Column): Column =
    transform(vec, x =>
      when(m === 0.0, lit(0L))
        .otherwise(floor(x.cast("double") * 127.0 / m))
        .cast("int"))

  /** Convenience single-expression form (tests, tiny vectors). Prefer the
    * staged select with [[quantizedWith]] in query plans — this form pays
    * the O(d²) re-reduction documented there. */
  def quantized(vec: Column): Column = quantizedWith(vec, maxAbs(vec))

  /** Codes column via the staged two-select shape: (id, codes as vecCol).
    * maxAbs lands in its own projection so Catalyst keeps it one-per-row
    * (CollapseProject refuses to inline a non-cheap alias referenced
    * twice). */
  def quantizedCodes(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), col(vecCol).as("__v"), maxAbs(col(vecCol)).as("__m"))
      .select(col(idCol), quantizedWith(col("__v"), col("__m")).as(vecCol))

  /** Reconstructed doubles q_i · scale (for approximate distance scoring). */
  def dequantized(q: Column, scale: Column): Column =
    transform(q, v => v.cast("double") * scale)

  /** Per-vector quantization profile (q61's shape): dimension count, scale,
    * exact integer sum/min/max of the codes, and the saturated-code count.
    * All-integer aggregates + same-op-order doubles — bit-stable anywhere.
    */
  def stats(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(
      col(idCol).as("vec_id"),
      col(vecCol).as("__v"),
      maxAbs(col(vecCol)).as("__m"))
      .select(
        col("vec_id"),
        size(col("__v")).cast("long").as("n_dims"),
        (col("__m") / 127.0).as("scale"),
        quantizedWith(col("__v"), col("__m")).as("__q"))
      .select(
        col("vec_id"), col("n_dims"), col("scale"),
        aggregate(col("__q"), lit(0L), (a, x) => a + x).as("q_sum"),
        array_min(col("__q")).as("q_min"),
        array_max(col("__q")).as("q_max"),
        size(filter(col("__q"), v => abs(v) === 127)).cast("long").as("n_sat"))
}
