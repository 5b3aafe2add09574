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
    // The matched quote row is carried as ONE struct column filled by a
    // single last(ignoreNulls): filling each attach column independently
    // would mix fields from different quote rows whenever the most recent
    // quote has a null in one of them (merge_asof / ASOF JOIN attach the
    // whole row atomically, nulls included).
    val qStructType = org.apache.spark.sql.types.StructType(
      attachCols.map(c => quote.schema(c)))
    // tag 0 = quote, 1 = probe: at equal ts the quote sorts first, making
    // the match inclusive (quote.ts == probe.ts attaches)
    val taggedProbe = probe
      .withColumn("__tag", lit(1))
      .withColumn("__q", lit(null).cast(qStructType))
    val taggedQuote = quote
      .select(keys.map(col) ++ Seq(col(tsCol)) ++
        Seq(struct(attachCols.map(col): _*).as("__q")): _*)
      .withColumn("__tag", lit(0))
    val unioned = taggedProbe.unionByName(taggedQuote, allowMissingColumns = true)
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__qlast", last(col("__q"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(probeCols.map(col) ++
        attachCols.map(c => col("__qlast").getField(c).as(s"asof_$c")): _*)
  }
}
