package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exponentially time-decayed aggregates — the recency-weighted count/
  * sum behind trending detection and freshness-weighted mixing: each
  * observation contributes 2^(−age/halfLife), so yesterday counts half
  * of today (at a 24 h half-life) and last month is noise. Computed as
  * a plain weighted aggregate against a fixed reference time (the
  * stream face would fold the same weights incrementally).
  *
  * Cross-engine discipline: age is INTEGER hours (ns div), the decay
  * exponent multiplies age by one shared Scala-computed double literal
  * (−ln2/halfLife — interpolate [[decayRate]] into oracle SQL), each
  * exp() output quantizes to DECIMAL(18,9) BEFORE the order-free
  * decimal sum (the ln/PSI discipline applied to exp), and the single
  * cast back to double is exact at scale 9.
  *
  * Scale shape: the reference time is one broadcast scalar row
  * (cross-join of a zero-group aggregate — no collect, no second
  * scan caching); everything else is scan-stage arithmetic plus one
  * partial-aggregated group-by.
  */
object TimeDecay {

  /** −ln(2)/halfLifeHours — the per-hour decay exponent. Interpolate
    * THIS value into the oracle so both engines multiply by the same
    * double. */
  def decayRate(halfLifeHours: Int): Double =
    -math.log(2.0) / halfLifeHours

  /** Per-key decayed count and decayed value-sum relative to the
    * dataset's max timestamp. `tsCol` is epoch-ns (the events
    * contract); `valueCol` rows with null value count toward n and
    * decayed_count but not decayed_value. Output: (keys…, n,
    * decayed_count, decayed_value). */
  def decayedAgg(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      valueCol: String,
      halfLifeHours: Int = 24): DataFrame = {
    require(halfLifeHours >= 1, s"halfLifeHours >= 1: $halfLifeHours")
    val rate = decayRate(halfLifeHours)
    val ref = df.agg(max(col(tsCol)).as("__ref"))
    val aged = df.crossJoin(broadcast(ref))
      .withColumn("__age_h",
        expr(s"(__ref - $tsCol) div 3600000000000"))
      .withColumn("__w",
        exp(col("__age_h").cast("double") * lit(rate))
          .cast(DecimalType(18, 9)))
    // decayed_value: NEVER multiply in double and quantize after (the
    // round-5 PSI lesson — a quantization-boundary product flips
    // cross-engine). Quantize each factor once (exp at scale 6, the
    // raw value at scale 3 — data values are coarse, so the cast is
    // boundary-safe), then multiply in DECIMAL: scale 6+3 = 9 exactly,
    // no rescale, and the scale-9 sum recovers exactly in double.
    aged.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col("__w")).cast("double").as("decayed_count"),
        sum(when(col(valueCol).isNotNull,
          exp(col("__age_h").cast("double") * lit(rate))
            .cast(DecimalType(12, 6)) *
            col(valueCol).cast(DecimalType(12, 3))))
          .cast("double").as("decayed_value"))
  }
}
