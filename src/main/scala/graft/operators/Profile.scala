package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-pass numeric profiling — the DESCRIBE/data-catalog summary
  * (per column: rows, nulls, min, max) computed the only way that is
  * acceptable at 100 TB: ONE scan with every column's aggregates
  * side by side in a zero-group aggregate (map-side partials, no
  * shuffle of data rows), then a constant-size melt to the
  * (column, stat…) report shape. Profiling N columns with N scans —
  * or worse, N `df.describe` calls — reads the corpus N times for a
  * report of N rows.
  *
  * min/max are SELECTIONS of stored values, so they are exact and
  * engine-portable even for doubles (no accumulation order to
  * disagree on — the NOTES-rule-4 distinction between selecting a
  * float and arithmetic on it).
  */
object Profile {

  /** Profile `cols` (numeric or castable-to-double) of `df` in one
    * scan. Output rows in the given column order:
    * (column, n_rows, n_null, min_d, max_d) with min/max null for
    * all-null columns. */
  def numeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "at least one column")
    require(cols.distinct.size == cols.size, s"duplicate columns: $cols")
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(count(when(col(c).isNull, 1)).as(s"__null_$c"),
        min(col(c)).cast("double").as(s"__min_$c"),
        max(col(c)).cast("double").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val report = cols.map { c =>
      struct(lit(c).as("column"), col("__n").as("n_rows"),
        col(s"__null_$c").as("n_null"), col(s"__min_$c").as("min_d"),
        col(s"__max_$c").as("max_d"))
    }
    one.select(explode(array(report: _*)).as("r")).select(col("r.*"))
  }

  /** Higher-moment shape profile per group — skewness and excess
    * kurtosis from EXACT integer power sums (Σx, Σx², Σx³, Σx⁴ in
    * DECIMAL(38,0)), the distribution-shape diagnostic behind "is this
    * source's length distribution lognormal-ish or two-regime?". The
    * built-in skewness/kurtosis aggregates accumulate doubles in
    * partition order (not reproducible — q142's reasoning); this
    * formulation pushes ONE partial-aggregated exchange of four
    * decimal sums and derives both stats by a pinned IEEE sequence
    * over the exact central-moment combinations:
    *   m2 = (n·Σx² − (Σx)²) / n²         (×n² kept integral)
    *   m3 = (n²·Σx³ − 3n·Σx·Σx² + 2(Σx)³) / n³
    *   m4 = (n³·Σx⁴ − 4n²·Σx·Σx³ + 6n·(Σx)²·Σx² − 3(Σx)⁴) / n⁴
    *   skew = m3/m2^1.5, ex_kurt = m4/m2² − 3.
    * Domain: an input the DECIMAL(18,0) try_cast cannot represent
    * (|v| ≥ 10^18) nulls and DROPS the row under either ANSI setting —
    * n counts exactly the rows the sums saw (linearFit's pairwise
    * convention; the oracle states the same TRY_CAST). Within the
    * admitted domain the moment COMBINATIONS must stay inside
    * DECIMAL(38): with |x| ≤ 10³ that is n ≲ 10⁶ rows per group —
    * quantize/winsorize bigger magnitudes first; combination overflow
    * raises (decimal arithmetic throws), it never wraps.
    *
    * Output: (keys…, n, skewness, ex_kurtosis), nulls when m2 = 0. */
  def shape(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val base = df
      .select(keys.map(col) :+
        expr(s"try_cast($valueCol AS decimal(18,0))").as("__x"): _*)
      .where(col("__x").isNotNull)
    val sums = base.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(col("__x")).cast(d38).as("s1"),
      sum((col("__x") * col("__x")).cast(d38)).cast(d38).as("s2"),
      sum((col("__x") * col("__x") * col("__x")).cast(d38)).cast(d38)
        .as("s3"),
      sum((col("__x") * col("__x") * col("__x") * col("__x")).cast(d38))
        .cast(d38).as("s4"))
    val nD = col("n").cast(d38)
    // scaled central moments (×n^k) as exact integers, ONE cast each
    val m2n2 = (nD * col("s2") - col("s1") * col("s1")).cast(d38)
    val m3n3 = (nD * nD * col("s3") -
      lit(3).cast(d38) * nD * col("s1") * col("s2") +
      lit(2).cast(d38) * col("s1") * col("s1") * col("s1")).cast(d38)
    val m4n4 = (nD * nD * nD * col("s4") -
      lit(4).cast(d38) * nD * nD * col("s1") * col("s3") +
      lit(6).cast(d38) * nD * col("s1") * col("s1") * col("s2") -
      lit(3).cast(d38) * col("s1") * col("s1") * col("s1") * col("s1"))
      .cast(d38)
    val withM = sums
      .withColumn("__m2", m2n2.cast("double"))
      .withColumn("__m3", m3n3.cast("double"))
      .withColumn("__m4", m4n4.cast("double"))
    // the n powers cancel exactly in both ratios:
    // skew = (m3n3/n³) / (m2n2/n²)^1.5 = m3n3 / m2n2^1.5
    val skew = when(col("__m2") > 0d,
      col("__m3") / (sqrt(col("__m2")) * col("__m2")))
    // kurt = (m4n4/n⁴) / (m2n2/n²)² − 3 = m4n4 / m2n2² − 3
    val kurt = when(col("__m2") > 0d,
      col("__m4") / (col("__m2") * col("__m2")) - lit(3d))
    withM.select(keys.map(col) ++ Seq(col("n"),
      skew.as("skewness"), kurt.as("ex_kurtosis")): _*)
  }

  /** Cardinality profile — per column: rows, nulls, and the
    * [[LinearCount]] distinct ESTIMATE — the data-catalog sketch that
    * [[numeric]] deliberately omits (exact countDistinct per column is
    * an extra shuffle per column; the sketch is one). Two passes over
    * the source: a zero-group null/row count (numeric's shape, no
    * shuffle) and ONE sketch pass over the |cols|-way stacked
    * (column, value-as-string) fan-out — which is immediately reduced
    * to its distinct (column, bucket) rows, so nothing fan-out-sized
    * shuffles or materializes. Values hash by their string form (the
    * sketch's portable hash domain); null-vs-"null" ambiguity does not
    * arise because nulls are counted separately and never hashed.
    * Output: (column, n_rows, n_nulls, m, d, est) — q135's estimate
    * contract per column. */
  def cardinality(
      df: DataFrame,
      cols: Seq[String],
      m: Int = 4096,
      salt: String = "prof"): DataFrame = {
    require(cols.nonEmpty, "at least one column")
    require(cols.distinct.size == cols.size, s"duplicate columns: $cols")
    val stacked = df.select(explode(array(cols.map(c =>
      struct(lit(c).as("column"), col(c).cast("string").as("v"))): _*))
      .as("r")).select(col("r.*"))
    val aggs = count(lit(1)).as("__n") +: cols.map(c =>
      count(when(col(c).isNull, 1)).as(s"__null_$c"))
    val nulls = df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c => struct(lit(c).as("column"),
        col("__n").as("n_rows"), col(s"__null_$c").as("n_nulls"))): _*))
        .as("r")).select(col("r.*"))
    val est = LinearCount.distinctEstimate(stacked, Seq("column"), "v",
      m, salt)
    nulls.join(est, Seq("column"), "left")
      .select(col("column"), col("n_rows"), col("n_nulls"),
        col("m"), col("d"), col("est"))
  }
}
