package graft.operators
import graft.Materialize.MatOps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Integer-exact k-sigma outlier flags over per-group series — the
  * monitoring query ("which hours were anomalous for this event
  * type?") made hash-exact: the textbook test |x − μ| > k·σ needs a
  * square root and a division, both of which poison cross-engine
  * comparison; cross-multiplying the SQUARED test by H² clears every
  * denominator instead:
  *
  *   (x − ΣT/H)² > k²·(H·ΣT² − (ΣT)²)/H²
  *     ⟺  (x·H − ΣT)² > k²·(H·ΣT² − (ΣT)²)
  *
  * With integral x (a scaled-decimal series), both sides are exact
  * DECIMAL(38,0) integers — no sqrt, no division, no float anywhere
  * (the QualityRules cross-multiplication trick applied to variance).
  * Caller must keep magnitudes inside 38 digits: |x|·H and
  * k²·H·Σx² must fit, i.e. |x| ≲ 10^14 at a million buckets.
  *
  * Scale shape: the per-group (H, ΣT, ΣT²) stats table is |groups|
  * rows and broadcast-joins back; the series itself never reshuffles.
  * Statistics run over the OBSERVED buckets (absent buckets do not
  * contribute zeros — resample upstream if they should).
  */
object Anomaly {

  /** Flag series points with |value − mean| > k·stddev, exactly.
    * `series` holds one row per (groupCols, bucket) with an INTEGRAL
    * `valueIntCol` (long or integral decimal). Output: input columns +
    * is_anomaly. Groups with one row (variance undefined ⇒ rhs 0,
    * lhs 0) flag nothing. Null values and null group keys fail loudly
    * (the Drift/HistogramSketch contract): a null value would count in
    * H but not in the sums — silently corrupting the variance identity
    * for its whole group — and a null key would vanish in the stats
    * equi-join. */
  def sigmaFlags(
      series: DataFrame,
      groupCols: Seq[String],
      valueIntCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"sigmaFlags needs k >= 1, got $k")
    val v = col(valueIntCol)
    val nullKey = groupCols.map(col(_).isNull).reduce(_ || _)
    val t = when(nullKey, raise_error(lit(
        s"Anomaly.sigmaFlags: null group key in ${groupCols.mkString(",")}"))
        .cast(DecimalType(38, 0)))
      .when(v.isNull, raise_error(lit(
        s"Anomaly.sigmaFlags: null $valueIntCol"))
        .cast(DecimalType(38, 0)))
      .otherwise(v.cast(DecimalType(38, 0)))
    // stage boundary: the series (|groups| × |buckets| rows — already
    // aggregate-sized) feeds the stats AND the flag join; materialize
    // it once so the upstream aggregation never re-runs per branch
    val withT = series.withColumn("__t", t).materialize()
    val stats = withT.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).cast(DecimalType(38, 0)).as("__h"),
        sum(col("__t")).as("__st"),
        sum(col("__t") * col("__t")).as("__st2"))
    val lhsRoot = col("__t") * col("__h") - col("__st")
    val rhs = lit(k.toLong * k) *
      (col("__h") * col("__st2") - col("__st") * col("__st"))
    withT
      .join(broadcast(stats), groupCols)
      .withColumn("is_anomaly", lhsRoot * lhsRoot > rhs)
      .drop("__t", "__h", "__st", "__st2")
  }

  /** Robust outlier flags: |x − median| > k·MAD, with median and MAD
    * (median absolute deviation) as EXACT order statistics
    * (percentile_disc lower-median over integers — [[OrderStats]]'s
    * rank selection), so unlike [[sigmaFlags]] a single wild value
    * cannot drag the threshold toward itself — the robust test a
    * corpus-quality gate wants for length/size distributions with
    * heavy tails. Zero floats end to end: selected medians, integer
    * absolute deviations, one integer cross-compare.
    *
    * Output: input columns + (median, abs_dev, mad, is_outlier).
    * Null group keys or values fail loudly (the sigmaFlags contract —
    * a null would silently vanish from one side of the rank math).
    *
    * Scale shape: two order-statistic passes (each one hash exchange +
    * window sort over the group, spill-safe) and two broadcast joins
    * of |groups|-sized medians; the series itself is scanned per pass
    * but never materialized — the only state that persists is
    * group-sized. */
  def madFlags(
      series: DataFrame,
      groupCols: Seq[String],
      valueIntCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"madFlags needs k >= 1, got $k")
    val v = col(valueIntCol)
    val nullKey = groupCols.map(col(_).isNull).reduce(_ || _)
    val checked = series.withColumn(valueIntCol,
      when(nullKey, raise_error(lit(
          s"Anomaly.madFlags: null group key in ${groupCols.mkString(",")}"))
          .cast("long"))
        .when(v.isNull, raise_error(lit(
          s"Anomaly.madFlags: null $valueIntCol")).cast("long"))
        .otherwise(v))
    val med = OrderStats.quantilesDisc(checked, groupCols, valueIntCol,
        Seq(500))
      .drop("permille").withColumnRenamed("value", "median")
    val withDev = checked.join(broadcast(med), groupCols)
      .withColumn("abs_dev", abs(v - col("median")))
    val mad = OrderStats.quantilesDisc(withDev, groupCols, "abs_dev",
        Seq(500))
      .drop("permille").withColumnRenamed("value", "mad")
    withDev.join(broadcast(mad), groupCols)
      .withColumn("is_outlier", col("abs_dev") > lit(k.toLong) * col("mad"))
  }
}
