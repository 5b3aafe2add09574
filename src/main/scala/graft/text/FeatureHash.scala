package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.PolyHash

/** Feature hashing (Weinberger et al. 2009) — the hashing trick: bag-
  * of-words folded into a FIXED dimensionality by hashing each token to
  * a dimension and a sign, no vocabulary dictionary anywhere. That
  * no-dictionary property is the 100 TB story: a real vocabulary is
  * corpus-sized state that must be built, broadcast, and versioned; the
  * hashed projection is stateless scan-stage arithmetic, identical on
  * every shard and every day, which is why large-scale linear/GBDT
  * baselines and dedup-adjacent featurizations use it.
  *
  * The signed variant (sign = one hash bit, value = Σ ±tf) keeps the
  * projection unbiased: colliding tokens cancel in expectation instead
  * of inflating the bucket. Everything is integer arithmetic over the
  * shared salted PolyHash — the oracle replays each (dim, sign, tf)
  * triple and the grouped sum exactly.
  *
  * Scale shape: one scan, one explode to token counts (vocabulary-
  * bounded per doc), one (id, dim) partial-aggregated exchange of at
  * most |docs|·dims rows. Output is the long/sparse form (id, dim,
  * value) — the layout columnar ML ingestion wants; pivot to a dense
  * array downstream if a model needs it.
  */
object FeatureHash {

  /** Hashed signed bag-of-words: (idCol, dim ∈ [0, dims), value) with
    * value = Σ_tokens→dim sign(token)·tf(token); zero-sum dims are
    * dropped (sparse contract). `dims` must be a power of two (the
    * bucket split is then a bit mask of the 31-bit hash, leaving the
    * sign bit independent of the bucket bits). */
  def hashedBagOfWords(
      df: DataFrame,
      idCol: String,
      textCol: String,
      dims: Int = 32,
      salt: String = "fh"): DataFrame = {
    require(dims >= 2 && dims <= 65536 && (dims & (dims - 1)) == 0,
      s"dims must be a power of two in [2, 65536]: $dims")
    val tf = df
      .select(col(idCol),
        explode(TextAnalysis.tokens(col(textCol))).as("__tok"))
      .where(col("__tok").isNotNull)
      .groupBy(col(idCol), col("__tok"))
      .agg(count(lit(1)).as("__tf"))
    val h = PolyHash.saltedHash(col("__tok"), salt)
    tf.withColumn("dim", h.bitwiseAND(lit(dims.toLong - 1)))
      .withColumn("__sign",
        when(shiftright(h, Integer.numberOfTrailingZeros(dims))
          .bitwiseAND(lit(1L)) === 1L, lit(1L)).otherwise(lit(-1L)))
      .groupBy(col(idCol), col("dim"))
      .agg(sum(col("__sign") * col("__tf")).cast("long").as("value"))
      .where(col("value") =!= 0L)
  }
}
