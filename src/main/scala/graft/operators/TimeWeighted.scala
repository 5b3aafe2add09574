package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-weighted aggregation over step series — the TWAP/uptime/
  * billing primitive: an observation's value HOLDS from its timestamp
  * until the next observation (step interpolation), so the mean must
  * weight each value by its holding duration, not its sample count.
  * Plain avg() answers a different (and usually wrong) question on
  * irregular series: a sensor that reports once per anomaly would
  * dominate a per-sample mean exactly when it held least.
  *
  * Returns the exact INTEGRAL and DURATION rather than their ratio:
  * sums of decimal·long products are exact and engine-portable
  * (NOTES rule 4 — the one division is the consumer's, on two exact
  * numbers), and the two parts compose across re-aggregations
  * (day → month) where a pre-divided mean cannot.
  *
  * Scale shape: one exchange (hash by key), one lead window over it,
  * one keyed aggregate with map-side partials.
  */
object TimeWeighted {

  /** Per key: `integral = Σ valueCol · Δ` and `duration = Σ Δ`, where
    * `Δ = next observation's tsCol − this one's` (same integral units
    * as `tsCol`) and the LAST observation holds until `horizon`.
    * Pass `valueCol` pre-cast to a decimal type — the products and
    * sums then stay exact; the caller owns the precision budget
    * (value range × horizon span must fit the decimal).
    *
    * `tieCol` totally orders same-timestamp observations (zero-width
    * steps — deterministic, contribute nothing). Observations after
    * `horizon` yield negative Δ and are rejected loudly: a silently
    * negative holding time would corrupt the integral.
    */
  def stepIntegral(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      valueCol: String,
      tieCol: String,
      horizon: Column): DataFrame = {
    require(keys.nonEmpty, "at least one key column")
    val ord = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
    val nextTs = coalesce(lead(col(tsCol), 1).over(ord), horizon)
    val dt = nextTs - col(tsCol)
    val checkedDt = when(dt >= 0, dt.cast("long")).otherwise(raise_error(
      concat(lit("stepIntegral: observation after horizon by "),
        (-dt).cast("string"))).cast("long"))
    df.withColumn("__dt", checkedDt)
      .groupBy(keys.map(col): _*)
      .agg(sum(col(valueCol) * col("__dt")).as("integral"),
        sum(col("__dt")).as("duration"))
  }
}
