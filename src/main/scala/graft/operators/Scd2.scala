package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2 maintenance — the warehouse
  * primitive that turns a change log into a version history
  * (key, attr, valid_from, valid_to-or-null-for-current) and keeps that
  * history correct as update batches arrive. The reference pipeline
  * snapshots dimensions whole (`/root/reference/jobs/02_build_silver.py`
  * overwrites per run); SCD2 is the general form a 100 TB warehouse
  * actually runs: history is append-mostly, and each nightly batch must
  * touch only the keys it mentions.
  *
  * Multi-attribute dimensions pass a single `struct(...)` column as
  * `attrCol` — comparison is null-safe on the whole value.
  *
  * Scale shape: both entry points are ONE exchange (hash by key)
  * followed by chained Window passes over that same partitioning —
  * run-collapse via lag, interval close via lead — so the change log
  * never self-joins and never sorts globally. [[applyBatch]] touches
  * closed history only to union it back untouched (no shuffle on that
  * branch: it re-partitions nothing and re-writes nothing), which is
  * what makes a small batch cheap against a huge dimension.
  */
object Scd2 {

  private val From = "valid_from"
  private val To = "valid_to"

  /** Build the full version history from a change log: per key, order
    * observations by (`tsCol`, `tieCol`), collapse runs of equal
    * attribute values (null-safe), and close each surviving version at
    * the next survivor's timestamp — the last version per key stays
    * open (`valid_to` null). A row is a run boundary iff its attr
    * differs from its immediate predecessor's, so collapsing via lag
    * needs no second pass over survivors.
    *
    * `tieCol` totally orders same-timestamp observations within a key
    * (e.g. an event id); it is required precisely so the history is
    * deterministic — without it, two same-instant changes could close
    * each other in either order.
    *
    * Output: (keyCol, attrCol, valid_from, valid_to), timestamps in
    * `tsCol`'s own unit.
    */
  def fromChangeLog(
      log: DataFrame,
      keyCol: String,
      attrCol: String,
      tsCol: String,
      tieCol: String): DataFrame = {
    val ord = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    log
      .select(col(keyCol), col(attrCol), col(tsCol), col(tieCol))
      .withColumn("__prev", lag(col(attrCol), 1).over(ord))
      .withColumn("__first", row_number().over(ord) === 1)
      // null-safe run boundary: first observation, or attr changed
      // (either side may be null; <=> treats null = null as equal)
      .where(col("__first") || !(col(attrCol) <=> col("__prev")))
      .withColumn(To, lead(col(tsCol), 1).over(ord))
      .select(col(keyCol), col(attrCol), col(tsCol).as(From), col(To))
  }

  /** Apply an update batch to an existing SCD2 dimension, returning the
    * dimension as [[fromChangeLog]] over (original log ∪ batch) would
    * have built it — the equivalence a spec and the q114 oracle pin.
    * `dim` must carry (keyCol, attrCol, valid_from, valid_to); updates
    * carry (keyCol, attrCol, tsCol, tieCol).
    *
    * Closed versions (valid_to non-null) pass through untouched. Each
    * key's open version re-enters the window pass as a pseudo-update at
    * its own valid_from — updates equal to it collapse away (the
    * version stays open), a differing update closes it and opens a new
    * version, and keys new to the dimension open their first version.
    * Batch timestamps are assumed at-or-after the open version's
    * valid_from (late data needs the full rebuild); at equal (ts, tie)
    * the open version deterministically precedes the update.
    */
  def applyBatch(
      dim: DataFrame,
      updates: DataFrame,
      keyCol: String,
      attrCol: String,
      tsCol: String,
      tieCol: String): DataFrame = {
    val history = dim.where(col(To).isNotNull)
      .select(col(keyCol), col(attrCol), col(From), col(To))
    // open versions join the batch as rank-0 observations so the same
    // run-collapse decides whether anything actually changed
    val open = dim.where(col(To).isNull)
      .select(col(keyCol), col(attrCol), col(From).as(tsCol),
        lit(null).cast(updates.schema(tieCol).dataType).as(tieCol),
        lit(0).as("__rank"))
    val batch = updates
      .select(col(keyCol), col(attrCol), col(tsCol), col(tieCol),
        lit(1).as("__rank"))
    val ord = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__rank"), col(tieCol))
    val merged = open.unionByName(batch)
      .withColumn("__prev", lag(col(attrCol), 1).over(ord))
      .withColumn("__first", row_number().over(ord) === 1)
      .where(col("__first") || !(col(attrCol) <=> col("__prev")))
      .withColumn(To, lead(col(tsCol), 1).over(ord))
      .select(col(keyCol), col(attrCol), col(tsCol).as(From), col(To))
    history.unionByName(merged)
  }
}
