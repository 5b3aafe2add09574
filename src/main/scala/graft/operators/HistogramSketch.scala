package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-boundary histogram quantile sketch — approximate quantiles
  * over arbitrarily many rows in |groups| × |boundaries| integers of
  * state, the bounded-memory distribution profile a 100 TB corpus
  * needs (e.g. "where should the length/quality cutoff sit per
  * source"). Spark's own approx_percentile is sketch-based too, but
  * its merge order makes results partitioning-dependent (rows-only
  * forever); HERE the boundaries are FIXED literals, so the histogram
  * is a plain grouped count — exact, associative, identical on any
  * engine — and the quantile estimate (the smallest boundary whose
  * cumulative count reaches ⌈N·p/1000⌉) is pure integer arithmetic the
  * DuckDB oracle replays bit-for-bit (q100). The price is resolution
  * (the answer is a boundary, not an interpolated value): choose
  * boundaries on the value's natural log-ish scale.
  *
  * Scale shape: bucket assignment is a scan-stage literal comparison
  * chain (codegen-friendly, no UDF); the one exchange is the grouped
  * count whose map-side partials are already sketch-sized; everything
  * after operates on |groups| × |boundaries| rows.
  */
object HistogramSketch {

  /** Per-group permille-quantile estimates of a non-negative integral
    * `valueCol`. `boundaries` must be sorted ascending and start at the
    * minimum possible value — a row below boundaries.head, or a null
    * value, fails the query with a raise_error naming the offending
    * value (silent mis-bucketing would shift every estimate);
    * `permille` in (0, 1000].
    *
    * Output: group cols + (permille, n_rows, est) where est is the
    * smallest boundary b_i with |{v : v < next boundary}| ≥ ⌈n·p/1000⌉ —
    * i.e. the lower edge of the bucket containing the p-quantile.
    */
  def quantiles(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      boundaries: Seq[Long],
      permille: Seq[Int]): DataFrame = {
    require(boundaries.nonEmpty && boundaries == boundaries.sorted &&
      boundaries.distinct == boundaries, s"boundaries must be sorted distinct")
    require(permille.nonEmpty && permille.forall(p => p > 0 && p <= 1000),
      s"permille out of (0, 1000]: $permille")
    val v = col(valueCol)
    // bucket = (#boundaries <= v) - 1: a literal comparison chain.
    // Rows BELOW boundaries.head (or null) violate the documented
    // contract and would land in bucket -1, silently shifting every
    // cumulative count — reject them LOUDLY at scan time instead
    // (raise_error evaluates only on the violating branch).
    val chain = boundaries.map(b => when(v >= lit(b), 1).otherwise(0))
      .reduce(_ + _) - lit(1)
    val bucket = when(v >= lit(boundaries.head), chain)
      .otherwise(raise_error(concat(
        lit(s"HistogramSketch: $valueCol below boundaries.head " +
          s"(${boundaries.head}) or null: "),
        coalesce(v.cast("string"), lit("null")))).cast("int"))
    val gcols = groupCols.map(col)
    val hist = df
      .select(gcols :+ bucket.as("__bucket"): _*)
      .groupBy(gcols :+ col("__bucket"): _*)
      .agg(count(lit(1)).as("__cnt"))
    // sketch-sized from here on
    val wCum = Window.partitionBy(gcols: _*).orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(gcols: _*)
    val cum = hist
      .withColumn("__cum", sum(col("__cnt")).over(wCum))
      .withColumn("__n", sum(col("__cnt")).over(wAll))
    val bArr = array(boundaries.map(lit): _*)
    val pick = permille.map { p =>
      // smallest bucket whose cumulative count reaches ceil(n*p/1000)
      cum.where(col("__cum") * 1000 >= col("__n") * p)
        .groupBy(gcols :+ col("__n").as("n_rows"): _*)
        .agg(min(col("__bucket")).as("__b"))
        .select(gcols ++ Seq(lit(p).as("permille"), col("n_rows"),
          element_at(bArr, col("__b") + 1).as("est")): _*)
    }
    pick.reduce(_ unionByName _)
  }
}
