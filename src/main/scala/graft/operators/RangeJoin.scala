package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join — the second join family Spark lacks natively
  * (the first, as-of, is [[AsOf]]). For each fact row with a point
  * coordinate `t`, find every interval row with `s <= t <= e`. With no
  * equi-key, Spark plans a raw range predicate as
  * BroadcastNestedLoopJoin — O(|facts| × |intervals|) work and a
  * broadcast of one whole side, both of which are non-starters at scale.
  *
  * This is the bucketed formulation instead: pick a bucket width `w`,
  * explode each interval to the buckets it covers (⌈len/w⌉+1 rows — a
  * bounded, data-independent fan-out when intervals are bounded), map
  * each fact to its single bucket, and equi-join on the bucket id with
  * the exact range predicate as a residual filter. Each fact lands in
  * exactly one bucket, so no post-join dedup is needed; the join is a
  * plain shuffled equi-join that AQE can skew-split. Cost is one shuffle
  * of facts + exploded intervals — linear, broadcast-free, the shape
  * that survives 100 TB.
  *
  * Width tuning: w ≈ the typical interval length keeps the fan-out ≈ 2
  * rows per interval while keeping buckets fine enough that a fact only
  * meets intervals it plausibly overlaps. A too-small w inflates the
  * interval side; a too-large w inflates the candidate pairs the
  * residual filter discards. Both ends degrade linearly, not
  * catastrophically.
  */
object RangeJoin {

  /** Exact floor division as integer column math: `(x - pmod(x, w)) div w`
    * is a true floor for negative coordinates too (long `div` alone
    * truncates toward zero, which would split bucket −1 across the
    * origin). The division is Catalyst's IntegralDivide — pure long
    * arithmetic end to end. Column `/` would be Divide, which casts both
    * longs to double: exact only below 2^53, so epoch-NANOsecond
    * coordinates (~1.8e18) produce bucket labels that deviate from the
    * true floor (e.g. 2026-01-01 in ns at width 3600000001 lands one
    * bucket off). The deviation is monotone, which happens to keep the
    * equi-join's matches intact, but exact floor labels are the contract
    * every claim in this file (coverage, exactly-once, fan-out bounds)
    * reasons about — so the arithmetic must be integral, not "close".
    * Spec-pinned against BigInt floor division at ns magnitudes.
    */
  private[graft] def floorDiv(c: org.apache.spark.sql.Column, w: Long) = {
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(IntegralDivide(
      ColumnBridge.expression(c - pmod(c, lit(w))),
      ColumnBridge.expression(lit(w))))
  }

  /** Column-divisor twin (positive divisors): TRUE floor division.
    * NOTE (round-9 correction, NOTES.md): DuckDB `//` does NOT floor —
    * on integers it truncates toward zero, exactly like Spark `div`.
    * Use floorDiv only when the ORACLE side also floors (e.g. a
    * floor(CAST(... AS DOUBLE) / w) text); to match a DuckDB integer
    * `//`, plain `div` is the correct twin. */
  private[graft] def floorDiv(c: org.apache.spark.sql.Column,
      w: org.apache.spark.sql.Column) = {
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(IntegralDivide(
      ColumnBridge.expression(c - pmod(c, w)),
      ColumnBridge.expression(w)))
  }

  /** Inner interval join: every (fact, interval) pair with
    * `interval.s <= fact.t <= interval.e` (both ends inclusive).
    * Coordinates are integral (epoch-µs longs in the event queries).
    * Intervals with `s > e` are empty and dropped, mirroring
    * `BETWEEN`'s empty result on a reversed range.
    *
    * Output columns: all of `facts`, then all of `intervals`. Column
    * names must be disjoint across the two sides.
    *
    * @param bucketWidth bucket size in coordinate units; see class doc
    */
  def intervalJoin(
      facts: DataFrame,
      tCol: String,
      intervals: DataFrame,
      sCol: String,
      eCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val overlap = facts.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty, s"column names must be disjoint: $overlap")
    val bucket = "__rj_bucket"
    val f = facts.withColumn(bucket, floorDiv(col(tCol), bucketWidth))
    val i = intervals
      .where(col(sCol) <= col(eCol))
      .withColumn(bucket, explode(sequence(
        floorDiv(col(sCol), bucketWidth), floorDiv(col(eCol), bucketWidth))))
    f.join(i, Seq(bucket))
      .where(col(tCol) >= col(sCol) && col(tCol) <= col(eCol))
      .drop(bucket)
  }

  /** Interval×interval overlap join: every (left, right) pair with
    * `left.s <= right.e && right.s <= left.e` (closed intervals —
    * touching endpoints overlap). Both sides explode to their covered
    * buckets; a matched pair is kept ONLY in the first bucket the two
    * ranges share (`bucket == greatest(floor(ls/w), floor(rs/w))`, which
    * overlap guarantees both sides cover) — each pair emerges exactly
    * once WITHOUT a distinct, so nothing re-shuffles after the join.
    * Empty intervals (s > e) drop, mirroring the point form.
    */
  def overlapJoin(
      left: DataFrame,
      lsCol: String,
      leCol: String,
      right: DataFrame,
      rsCol: String,
      reCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty, s"column names must be disjoint: $overlap")
    val bucket = "__rj_bucket"
    def banded(df: DataFrame, s: String, e: String) =
      df.where(col(s) <= col(e)).withColumn(bucket,
        explode(sequence(floorDiv(col(s), bucketWidth),
          floorDiv(col(e), bucketWidth))))
    banded(left, lsCol, leCol).join(banded(right, rsCol, reCol), Seq(bucket))
      .where(col(lsCol) <= col(reCol) && col(rsCol) <= col(leCol))
      .where(col(bucket) === greatest(
        floorDiv(col(lsCol), bucketWidth), floorDiv(col(rsCol), bucketWidth)))
      .drop(bucket)
  }
}
