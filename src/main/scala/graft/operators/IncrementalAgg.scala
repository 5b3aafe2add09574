package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental aggregate maintenance — the materialized-view kernel:
  * keep a per-key algebraic state (count / exact-decimal sum / min /
  * max) and fold INSERT-ONLY deltas into it without touching the base
  * rows. At 100 TB this is the difference between "re-aggregate the
  * corpus nightly" and "aggregate the day's delta and merge": the wide
  * exchange is delta-sized, and the merge is a key-sized equi-join
  * against the stored state table.
  *
  * The state is algebraic on inserts only: count and sum would accept
  * retractions (negative deltas), but min/max are NOT retractable —
  * deleting the current minimum needs the base rows to find the next
  * one (the standard materialized-view limitation). Deletions therefore
  * re-aggregate affected keys; this operator does not pretend
  * otherwise.
  *
  * The sum is an exact DECIMAL sum (associative on any partitioning
  * and any base/delta split — the repo-wide float discipline), so
  * merged state is bit-identical to a from-scratch aggregation, which
  * is exactly what the q107 oracle proves.
  */
object IncrementalAgg {

  /** Per-key state: (keyCols..., n_rows, total, vmin, vmax) where
    * `total` is the exact DECIMAL(28,6) sum of `sumCol` and vmin/vmax
    * range over `ordCol` (any orderable type). */
  def state(df: DataFrame, keyCols: Seq[String], sumCol: String,
      ordCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col(sumCol).cast(DecimalType(28, 6))).as("total"),
        min(col(ordCol)).as("vmin"),
        max(col(ordCol)).as("vmax"))

  /** Merge two states over the same key/columns: count/sum add, ranges
    * widen; keys present on one side pass through (least/greatest skip
    * the missing side's nulls). state(a ∪ b) == merge(state(a),
    * state(b)) for any disjoint row split — spec-pinned, including
    * associativity across three-way splits. */
  def merge(base: DataFrame, delta: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val b = base.select(keyCols.map(col) ++ Seq(col("n_rows").as("__bn"),
      col("total").as("__bt"), col("vmin").as("__bmin"),
      col("vmax").as("__bmax")): _*)
    val d = delta.select(keyCols.map(col) ++ Seq(col("n_rows").as("__dn"),
      col("total").as("__dt"), col("vmin").as("__dmin"),
      col("vmax").as("__dmax")): _*)
    b.join(d, keyCols, "full_outer")
      .select(keyCols.map(col) ++ Seq(
        (coalesce(col("__bn"), lit(0L)) + coalesce(col("__dn"), lit(0L)))
          .as("n_rows"),
        // decimal + decimal is exact; coalesce keeps the one-sided case
        coalesce(col("__bt") + col("__dt"), col("__bt"), col("__dt"))
          .as("total"),
        least(col("__bmin"), col("__dmin")).as("vmin"),
        greatest(col("__bmax"), col("__dmax")).as("vmax")): _*)
  }
}
