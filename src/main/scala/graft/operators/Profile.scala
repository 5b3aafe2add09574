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
