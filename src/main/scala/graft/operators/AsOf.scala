package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — an operator family Spark lacks natively. For each probe
  * row, attach the most recent quote row with `quote.ts <= probe.ts`
  * (inclusive) within the same key.
  *
  * Implemented as the UNION + ordered-window pattern, not a range join:
  * tag both inputs, union them, and run `last_value(..., ignoreNulls)`
  * over an UNBOUNDED PRECEDING frame ordered by (ts, tag) per key. Cost is
  * one shuffle + one sort over |probe| + |quote| rows — no candidate-pair
  * explosion, no per-row binary search, skew-free as long as keys hash
  * well. This is the formulation that survives 100 TB; a broadcast
  * range-join would not.
  */
object AsOf {

  /** @param probe     left side (all rows preserved)
    * @param quote     right side (its `attachCols` get attached)
    * @param keys      equi-key columns present on both sides
    * @param tsCol     ordering column present on both sides (must be
    *                  totally ordered within a key for determinism)
    * @param attachCols quote columns to carry onto probe rows (emitted as
    *                  `asof_<col>`, null when no quote precedes the probe)
    */
  def asOfJoin(
      probe: DataFrame,
      quote: DataFrame,
      keys: Seq[String],
      tsCol: String,
      attachCols: Seq[String]): DataFrame = {
    val probeCols = probe.columns
    // tag 0 = quote, 1 = probe: at equal ts the quote sorts first, making
    // the match inclusive (quote.ts == probe.ts attaches)
    val taggedProbe = probe
      .withColumn("__tag", lit(1))
      .select(probeCols.map(col) ++ Seq(col("__tag")) ++
        attachCols.map(c => lit(null).cast(quote.schema(c).dataType).as(s"__q_$c")): _*)
    val taggedQuote = quote
      .select(keys.map(col) ++ Seq(col(tsCol)) ++ attachCols.map(c => col(c).as(s"__q_$c")): _*)
      .withColumn("__tag", lit(0))
    val unioned = taggedProbe.unionByName(taggedQuote, allowMissingColumns = true)
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attached = attachCols.foldLeft(unioned) { (d, c) =>
      d.withColumn(s"asof_$c", last(col(s"__q_$c"), ignoreNulls = true).over(w))
    }
    attached
      .filter(col("__tag") === 1)
      .select(probeCols.map(col) ++ attachCols.map(c => col(s"asof_$c")): _*)
  }
}
