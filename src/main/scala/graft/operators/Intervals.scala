package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps

/** Interval coverage — merge overlapping intervals into maximal spans
  * (gaps-and-islands over true intervals, not points) and read the
  * uncovered holes back out. The point-sessionization in
  * `streaming/EventStreams.sessionStats` is the degenerate case where
  * every interval has the same length; here intervals carry their own
  * extents (outage windows, meeting blocks, activity spans), so a later
  * short interval can be swallowed whole by an earlier long one — which
  * is exactly what the running-max formulation handles and a
  * lag-on-start formulation gets wrong.
  *
  * Scale shape: ONE exchange (hash by key), two Window passes over that
  * partitioning (prefix max of the end, prefix sum of the island
  * indicator), then a keyed aggregate — no self-join, no global sort.
  * Island ids are per-key prefix sums, so they never coordinate across
  * keys; AQE handles a key whose interval count skews.
  */
object Intervals {

  /** Merge intervals `[sCol, eCol]` (closed; touching endpoints merge)
    * per key into maximal spans. Two intervals separated by at most
    * `maxGap` also merge — the "bridge gaps shorter than g" form used
    * for outage dedup and activity stitching. Empty intervals
    * (`s > e`) are dropped. Output: keyCols ++ (span_start, span_end,
    * n_intervals), one row per maximal span.
    *
    * A span boundary is an interval whose start lies beyond the
    * running max of all PRECEDING ends (+ gap) in (s, e) order; the
    * prefix sum of boundaries numbers the islands. Rows tied on
    * (s, e) are interchangeable — any tie order yields the same spans.
    */
  def mergeOverlapping(
      df: DataFrame,
      keyCols: Seq[String],
      sCol: String,
      eCol: String,
      maxGap: Long = 0L): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    require(maxGap >= 0, s"maxGap must be >= 0: $maxGap")
    val keys = keyCols.map(col)
    val ord = Window.partitionBy(keys: _*).orderBy(col(sCol), col(eCol))
    val prefix = ord.rowsBetween(Window.unboundedPreceding, -1)
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.where(col(sCol) <= col(eCol))
      .withColumn("__pm", max(col(eCol)).over(prefix))
      .withColumn("__isl", sum(
        when(col("__pm").isNull || col(sCol) > col("__pm") + lit(maxGap), 1L)
          .otherwise(0L)).over(run))
      .groupBy(keys :+ col("__isl"): _*)
      .agg(min(col(sCol)).as("span_start"), max(col(eCol)).as("span_end"),
        count(lit(1)).as("n_intervals"))
      .drop("__isl")
  }

  /** The complement of [[mergeOverlapping]]: per key, the uncovered
    * holes BETWEEN consecutive merged spans (exclusive of both spans'
    * endpoints: a hole is `(span_end, next_span_start)` with positive
    * width under the closed-interval reading). Output: keyCols ++
    * (gap_start, gap_end), one row per hole; keys whose spans leave no
    * hole emit nothing. One more window pass over the same keyed
    * partitioning — the merge's exchange is reused.
    */
  def gaps(
      df: DataFrame,
      keyCols: Seq[String],
      sCol: String,
      eCol: String,
      maxGap: Long = 0L): DataFrame = {
    val keys = keyCols.map(col)
    val ord = Window.partitionBy(keys: _*).orderBy(col("span_start"))
    mergeOverlapping(df, keyCols, sCol, eCol, maxGap)
      .withColumn("__next", lead(col("span_start"), 1).over(ord))
      .where(col("__next").isNotNull && col("__next") > col("span_end") + 1)
      .select(keys :+ col("span_end").as("gap_start") :+
        col("__next").as("gap_end"): _*)
  }

  /** Concurrency profile — per time bucket, how many intervals are
    * active (interval stabbing count): the capacity question ("peak
    * concurrent sessions per hour") answered WITHOUT a range join of
    * intervals against the bucket grid. Each interval contributes one
    * +1 at its start bucket and one −1 after its end bucket; two
    * prefix sums over the grid recover the active count exactly:
    * active(b) = #\{start ≤ b\} − #\{end < b\}.
    *
    * Scale shape: the interval table reduces to two bucket-keyed count
    * aggregations (partial-combined, |buckets|-bounded); the only
    * non-parallel step is the prefix sum over the GRID, which is
    * calendar-bounded (a year of hours is 8 760 rows) — a deliberate
    * single-partition window over a tiny table, never over data. The
    * grid bounds are two driver-side scalars (the M3 collect rule).
    *
    * Output: (bucket, n_starts, n_ends, n_active) for every bucket in
    * [min start-bucket, max end-bucket]. Intervals with s > e drop. */
  def concurrencyProfile(
      df: DataFrame,
      sCol: String,
      eCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1: $bucketWidth")
    val spark = df.sparkSession
    val b = df.where(col(sCol) <= col(eCol))
      .select(expr(s"$sCol div $bucketWidth").as("__sb"),
        expr(s"$eCol div $bucketWidth").as("__eb"))
      .materialize()
    val bounds = b.agg(min(col("__sb")), max(col("__eb"))).head()
    if (bounds.isNullAt(0)) {
      import spark.implicits._
      return Seq.empty[(Long, Long, Long, Long)]
        .toDF("bucket", "n_starts", "n_ends", "n_active")
    }
    val starts = b.groupBy(col("__sb").as("bucket"))
      .agg(count(lit(1)).as("__ns"))
    val ends = b.groupBy(col("__eb").as("bucket"))
      .agg(count(lit(1)).as("__ne"))
    val grid = spark.range(bounds.getLong(0), bounds.getLong(1) + 1)
      .toDF("bucket")
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(starts, Seq("bucket"), "left")
      .join(ends, Seq("bucket"), "left")
      .withColumn("n_starts", coalesce(col("__ns"), lit(0L)))
      .withColumn("n_ends", coalesce(col("__ne"), lit(0L)))
      .withColumn("__cs", sum(col("n_starts")).over(w))
      .withColumn("__ce", sum(col("n_ends")).over(w))
      .withColumn("n_active", col("__cs") - (col("__ce") - col("n_ends")))
      .select("bucket", "n_starts", "n_ends", "n_active")
  }
}
