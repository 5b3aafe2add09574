package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Marketing-style conversion attribution over an event log — "which
  * channel gets credit for this conversion?" — the event-stream rollup
  * behind campaign reporting and training-data labeling of conversion
  * sessions.
  *
  * Last-touch semantics, computed with ONE per-entity window — never a
  * conversions×touches self-join (which re-shuffles the log twice and
  * explodes on active entities): sort each entity's events once by
  * (ts, id) and carry the most recent touch forward with
  * `last(..., ignoreNulls)` over the strictly-preceding frame. The two
  * carried columns (touch time, touch channel) null out on exactly the
  * same rows, so they always describe the same touch — no struct
  * shipping needed. Scale shape: one exchange keyed on the entity, a
  * spill-safe in-group sort, then a channel-sized aggregate; cost is
  * O(events), independent of touches-per-conversion.
  *
  * Eligibility is "sorts strictly before the conversion under
  * (ts, id)" — a same-timestamp touch with a smaller id counts, one
  * with a larger id does not (deterministic, and exactly replayable by
  * any engine stating the same frame). A preceding CONVERSION is never
  * a touch unless its type is listed in `touchTypes`.
  */
object Attribution {

  /** Each conversion event with its attributed channel.
    *
    * @param events     event log
    * @param entityCol  attribution scope (user / session)
    * @param tsCol      integral event time (epoch-ns per repo contract)
    * @param idCol      unique event id — the same-ts tie-break
    * @param typeCol    event type / channel column
    * @param convType   the conversion event type
    * @param touchTypes channels eligible for credit
    * @param lookback   max `tsCol` age of the credited touch (same unit
    *                   as tsCol); older touches yield `'(none)'`
    * @return conversion rows + (attributed_channel, touch_ts) where
    *         touch_ts is null for '(none)'
    */
  def lastTouch(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      idCol: String,
      typeCol: String,
      convType: String,
      touchTypes: Seq[String],
      lookback: Long): DataFrame = {
    require(lookback > 0, "lookback must be positive")
    require(!touchTypes.contains(convType),
      "convType in touchTypes would let a conversion credit itself")
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val isTouch = col(typeCol).isin(touchTypes: _*)
    val attributed = events
      .withColumn("__lt",
        last(when(isTouch, col(tsCol)), ignoreNulls = true).over(w))
      .withColumn("__lc",
        last(when(isTouch, col(typeCol)), ignoreNulls = true).over(w))
      .where(col(typeCol) === convType)
      .withColumn("__ok",
        col("__lt").isNotNull && col(tsCol) - col("__lt") <= lookback)
    attributed
      .withColumn("attributed_channel",
        when(col("__ok"), col("__lc")).otherwise(lit("(none)")))
      .withColumn("touch_ts", when(col("__ok"), col("__lt")))
      .drop("__lt", "__lc", "__ok")
  }
}
