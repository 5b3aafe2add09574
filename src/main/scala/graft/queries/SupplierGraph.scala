package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables

/** Shared supplier co-purchase graph for the graph-analytics faces
  * (q457 link prediction, q473 eccentricity, q495 PageRank
  * convergence): suppliers co-occurring in an order are candidate
  * edges, kept when their support exceeds the 830‰ support order
  * statistic. The threshold is an ORDER STATISTIC, not a constant —
  * the supplier dim scales with the data (100 at sf0.01, 1000 at
  * sf0.1), so any fixed support would either keep the clique or empty
  * the graph at the wrong scale; the quantile keeps edge density
  * ~10-17% at every sf (654 edges at sf0.01, ~48k at sf0.1). One
  * fact-sized pass builds supports; everything after is dim-sized. */
object SupplierGraph {

  val thresholdPermille = 830

  /** Oracle CTEs `it`, `sup`, `thr`, `e` — e = (a, c, w) with a < c. */
  def sqlEdgeCtes: String =
    s"""it AS (
       |  SELECT DISTINCT l_orderkey AS b, l_suppkey AS i FROM lineitem),
       |sup AS (
       |  SELECT x.i AS a, y.i AS c, count(*) AS w
       |  FROM it x JOIN it y ON x.b = y.b
       |  WHERE x.i < y.i GROUP BY 1, 2),
       |thr AS (
       |  SELECT max(CASE WHEN rn = ($thresholdPermille * n + 999) // 1000
       |             THEN w END) AS t
       |  FROM (SELECT w, row_number() OVER (ORDER BY w) AS rn,
       |               count(*) OVER () AS n FROM sup) r),
       |e AS (SELECT a, c, w FROM sup CROSS JOIN thr WHERE w > thr.t)""".stripMargin

  /** Spark edges (a, c, w), a < c, support above the 830‰ order stat. */
  def edges(s: SparkSession, dir: String): DataFrame = {
    val it = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("b"), col("l_suppkey").as("i"))
      .distinct()
    val sup = it.as("x").join(it.as("y"), col("x.b") === col("y.b"))
      .where(col("x.i") < col("y.i"))
      .groupBy(col("x.i").as("a"), col("y.i").as("c"))
      .agg(count(lit(1)).as("w"))
      .materialize() // supplier-pair dim
    val thr = graft.operators.OrderStats.quantilesDisc(
        sup.withColumn("k", lit(0L)), Seq("k"), "w",
        Seq(thresholdPermille))
      .select(col("value").as("t"))
    sup.crossJoin(broadcast(thr)).where(col("w") > col("t"))
      .select(col("a"), col("c"), col("w"))
      .materialize()
  }
}
