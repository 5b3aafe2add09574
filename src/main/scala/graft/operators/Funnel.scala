package graft.operators

import graft.Materialize.MatOps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered conversion funnels and retention cohorts — the two product
  * analytics shapes every event warehouse answers, expressed so each
  * needs only per-entity partitioning (no self-joins over the event
  * log, which is the naive formulation and quadratic in events per
  * entity).
  */
object Funnel {

  /** Ordered funnel: for each entity, the earliest completion time of
    * every stage, where stage k counts only at or after the entity's
    * stage-(k−1) time (the standard "did they view, THEN click, THEN
    * buy" semantics — an early purchase before the first view does not
    * complete stage 3). Output: (entityCol, t_1…t_N, stages_completed)
    * with t_k null once the funnel stalls; times are `tsCol`'s own unit.
    *
    * Scale shape: ONE exchange (hash by entity); the N stages are N
    * chained Window operators over the SAME partitioning — each stage's
    * time is a per-row window min that the next stage's filter reads —
    * so Spark plans one shuffle + N windowed passes, never a self-join.
    * Events per entity spill via the window sorter if they must.
    */
  def funnel(
      df: DataFrame,
      entityCol: String,
      typeCol: String,
      tsCol: String,
      stages: Seq[String],
      maxGap: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty && stages.distinct == stages,
      s"stages must be non-empty and distinct: $stages")
    require(maxGap.forall(_ > 0), s"maxGap must be positive: $maxGap")
    val w = Window.partitionBy(col(entityCol))
    val staged = stages.zipWithIndex.foldLeft(df) { case (acc, (stage, i)) =>
      val cond: Column =
        if (i == 0) col(typeCol) === stage
        else {
          val base = col(typeCol) === stage && col(s"t_$i").isNotNull &&
            col(tsCol) >= col(s"t_$i")
          // windowed funnel: each stage must land within maxGap of the
          // previous stage's completion (tsCol's unit), the "converted
          // within an hour" form
          maxGap.fold(base)(g => base && col(tsCol) <= col(s"t_$i") + lit(g))
        }
      acc.withColumn(s"t_${i + 1}", min(when(cond, col(tsCol))).over(w))
    }
    val tCols = stages.indices.map(i => col(s"t_${i + 1}"))
    val completed = tCols.map(t => when(t.isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    // per-entity window results are constant within the partition; max
    // collapses them to one row (and skips the all-null stalled stages)
    val aggs = stages.indices.map(i =>
      max(col(s"t_${i + 1}")).as(s"t_${i + 1}")) :+
      max(completed).as("stages_completed")
    staged.groupBy(col(entityCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Rolling distinct actives — DAU next to trailing-`window`-day
    * distinct actives (WAU for window = 7) and the stickiness ratio,
    * per observed day. The sliding DISTINCT count is the one rolling
    * metric a window frame cannot express (distinct doesn't decompose
    * over frames); the exact scale-shape is contribution explode: each
    * deduped (entity, day) row contributes to the `window` days it
    * keeps the entity active in, then a second dedup + count per day —
    * a bounded ×window fan-out of id-sized rows, never a range
    * self-join of the log. Days with no events emit nothing (and
    * contribute nothing to later windows' denominators — the observed-
    * calendar contract; left-join a calendar dim upstream if gap days
    * must appear).
    *
    * Output: (day, dau, rolling_actives, stickiness_ppm) with
    * stickiness_ppm = ⌊10⁶·dau/rolling⌋.
    */
  def rollingActives(
      df: DataFrame,
      entityCol: String,
      dayCol: String,
      window: Int): DataFrame = {
    require(window >= 1 && window <= 370, s"window in [1, 370]: $window")
    val active = df
      .where(col(entityCol).isNotNull && col(dayCol).isNotNull)
      .select(col(entityCol).as("__e"), col(dayCol).cast("long").as("__d"))
      .distinct()
      .materialize() // feeds dau, the contribution explode, and the calendar
    val days = active.select(col("__d").as("day")).distinct()
    val dau = active.groupBy(col("__d").as("day"))
      .agg(count(lit(1)).as("dau"))
    val rolling = active
      .withColumn("__off", explode(sequence(lit(0), lit(window - 1))))
      .select(col("__e"), (col("__d") + col("__off")).as("day"))
      .distinct()
      .join(days, Seq("day"), "leftsemi")
      .groupBy(col("day")).agg(count(lit(1)).as("rolling_actives"))
    dau.join(rolling, Seq("day"))
      .withColumn("stickiness_ppm",
        expr("(1000000 * dau) div rolling_actives"))
      .select(col("day"), col("dau"), col("rolling_actives"),
        col("stickiness_ppm"))
  }

  /** Retention cohorts: entities cohorted by their first active day,
    * counted by day offset — the (cohort, offset) → distinct-entities
    * triangle behind every retention curve. `dayCol` is an integral
    * day number (e.g. epoch-day). Exchanges: the (entity, day)
    * dedup, the per-entity cohort window, and the final cohort count —
    * all entity- or cohort-keyed; the raw event log is touched once. */
  def retention(
      df: DataFrame,
      entityCol: String,
      dayCol: String): DataFrame = {
    val w = Window.partitionBy(col(entityCol))
    df.select(col(entityCol), col(dayCol).as("__day"))
      .distinct()
      .withColumn("__cohort", min(col("__day")).over(w))
      .groupBy(col("__cohort").as("cohort_day"),
        (col("__day") - col("__cohort")).as("day_offset"))
      .agg(countDistinct(col(entityCol)).as("n_entities"))
  }

  /** Incremental activity-dim maintenance — the streaming face of
    * [[retention]]: fold a new event batch into the stored distinct
    * (entity, day) activity table. The dim is the COMPACT state
    * (|entities| × |active days|, orders of magnitude below the event
    * log), so a foreachBatch loop keeps it current with one
    * ids-only distinct exchange per batch and recomputes the
    * (cohort, offset) triangle from the dim whenever it is read —
    * the stored-dim discipline (SCD2's applyBatch shape) applied to
    * retention. Stream ≡ batch pinned in MlAndStreamingSpec. */
  def activityUpsert(
      dim: DataFrame,
      batch: DataFrame,
      entityCol: String,
      dayCol: String): DataFrame =
    dim.select(col(entityCol), col(dayCol))
      .union(batch.select(col(entityCol), col(dayCol)))
      .distinct()

  /** Markov transition counts — the path-analysis matrix behind "what
    * do users do AFTER X": per entity, each consecutive event pair in
    * (`tsCol`, `tieCol`) order contributes one (from_type, to_type)
    * observation; an entity's last event transits to the `endMarker`
    * sentinel so exits are first-class (rows of the matrix sum to the
    * entity-step count, not to it-depends). Output: (from_type,
    * to_type, n_transitions).
    *
    * One entity-keyed exchange feeding a lead window, then a
    * |types|²-group aggregate with map-side partials — the event log
    * never self-joins, same as [[funnel]].
    */
  def transitions(
      df: DataFrame,
      entityCol: String,
      typeCol: String,
      tsCol: String,
      tieCol: String,
      endMarker: String = "(end)"): DataFrame = {
    val ord = Window.partitionBy(col(entityCol))
      .orderBy(col(tsCol), col(tieCol))
    df.select(col(entityCol), col(typeCol), col(tsCol), col(tieCol))
      .withColumn("__to",
        coalesce(lead(col(typeCol), 1).over(ord), lit(endMarker)))
      .groupBy(col(typeCol).as("from_type"), col("__to").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
  }
}
