package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** THE signed daily net-revenue series (returned lines negative,
  * cents, observed ship days) — shared by the risk (q596–q598),
  * diagnostics (q611–q612) and trend (q633–q634) families. One
  * definition, one sign convention, one fact pass; a change here
  * (e.g. a cents→dollars rescale for overflow headroom) reaches every
  * face at once instead of drifting across copies. */
object DailyNet {

  /** Oracle CTE `d(day, net)` — net is HUGEINT cents. */
  def sql: String = """
    |d AS (
    |  SELECT epoch_us(l_shipdate) // 86400000000 AS day,
    |         sum(CASE WHEN l_returnflag = 'R' THEN -1 ELSE 1 END
    |             * CAST(l_extendedprice * 100 AS HUGEINT)) AS net
    |  FROM lineitem GROUP BY 1)""".stripMargin

  /** Spark frame (day BIGINT, net DECIMAL(38,0) cents) — a SpineCache
    * table: ~20 call sites each rebuilt this one-fact-pass calendar
    * reduction; it is now built once per process and read by every
    * consumer (long/decimal parquet round-trip is exact). */
  def frame(s: SparkSession, dir: String): DataFrame =
    graft.sources.SpineCache.table(s, dir, "daily_net_cents",
      "lineitem") {
      Tables.lineitem(s, dir)
        .groupBy(expr("unix_micros(CAST(l_shipdate AS TIMESTAMP))" +
          " div 86400000000").as("day"))
        .agg(sum(when(col("l_returnflag") === "R", -1).otherwise(1)
          * expr("CAST(l_extendedprice * 100 AS DECIMAL(38,0))"))
          .as("net"))
    }
}
