package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Shared customer→supplier trading-pair spine: the distinct
  * (customer, supplier) pairs with their lineitem count, built by the
  * ONE fact-fact join (lineitem ⋈ orders on the order key) that six
  * queries previously each rebuilt — q416's weighted HITS reads the
  * weights, the bipartite-HITS wave q981–q985 reads the binary
  * projection (the pairs are distinct by construction). A
  * [[graft.sources.SpineCache]] table: built once per process inside
  * the first consumer's timed region, read by the rest. */
object TradeGraph {

  /** (cu, su, w): distinct trading pairs with lineitem counts. */
  def pairs(s: SparkSession, dir: String): DataFrame =
    graft.sources.SpineCache.table(s, dir, "trading_pairs",
      Seq("lineitem", "orders")) {
      Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("su"))
        .join(Tables.orders(s, dir)
          .select(col("o_orderkey").as("ok"), col("o_custkey").as("cu")),
          "ok")
        .groupBy(col("cu"), col("su"))
        .agg(count(lit(1)).as("w"))
    }
}
