package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-10 price-ending forensics wave (the last-digit complement to
  * the shipped Benford first/second-digit faces q180/q558): cents-
  * ending histogram, round-number excess, the last-digit uniformity
  * χ², round-endings by market segment, and the effective tick-size
  * (granularity) audit on line prices.
  *
  * Exactness: endings are integer modulus on exact cents; excesses
  * are exact scaled rationals against the uniform law; the χ² applies
  * one same-op-order double to exact integer deviations.
  *
  * Scale: single fact scans collapsing to ≤100-row ending dims; the
  * segment face joins through the broadcast customer-dim path. */
object PriceEndingQueries {

  val all: Seq[Q] = Seq(q1036, q1037, q1038, q1039, q1040)

  /** Top-10 cents endings (00-99) of line prices vs the uniform
    * 10000-ppm expectation. */
  def q1036: Q = Q(
    "q1036_cents_ending_head",
    Some("""
      |WITH e AS (
      |  SELECT CAST(l_extendedprice * 100 AS BIGINT) % 100 AS ending,
      |         count(*) AS n
      |  FROM lineitem GROUP BY 1),
      |gl AS (SELECT sum(n) AS tot FROM e)
      |SELECT CAST(ending AS BIGINT) AS ending,
      |       CAST(n AS BIGINT) AS n_lines,
      |       CAST((1000000 * n) // (SELECT tot FROM gl) AS BIGINT)
      |         AS share_ppm
      |FROM e ORDER BY n DESC, ending LIMIT 10
      |""".stripMargin)) { (s, dir) =>
    val e = Tables.lineitem(s, dir)
      .groupBy(expr("CAST(CAST(l_extendedprice * 100 AS DECIMAL(38,0))" +
        " AS LONG) % 100").as("ending"))
      .agg(count(lit(1)).as("n"))
    val gl = e.agg(sum(col("n")).as("tot"))
    e.crossJoin(broadcast(gl))
      .orderBy(col("n").desc, col("ending")).limit(10)
      .select(col("ending").cast("long").as("ending"),
        col("n").as("n_lines"),
        expr("CAST((1000000 * n) div tot AS BIGINT)").as("share_ppm"))
  }

  /** Round-number excess at the psychological endings 00/50/95/99:
    * observed ppm vs the uniform 10000, excess in milli of expected. */
  def q1037: Q = Q(
    "q1037_round_number_excess",
    Some("""
      |WITH e AS (
      |  SELECT CAST(l_extendedprice * 100 AS BIGINT) % 100 AS ending
      |  FROM lineitem),
      |gl AS (SELECT count(*) AS tot FROM e),
      |pk AS (SELECT * FROM (VALUES (0),(50),(95),(99)) v(k))
      |SELECT CAST(pk.k AS BIGINT) AS ending,
      |       CAST(count(CASE WHEN e.ending = pk.k THEN 1 END) AS BIGINT)
      |         AS n_lines,
      |       CAST((1000000 * count(CASE WHEN e.ending = pk.k THEN 1 END))
      |            // (SELECT tot FROM gl) AS BIGINT) AS share_ppm,
      |       CAST((100000 * count(CASE WHEN e.ending = pk.k THEN 1 END))
      |            // (SELECT tot FROM gl) AS BIGINT) AS excess_milli
      |FROM pk LEFT JOIN e ON 1 = 1
      |GROUP BY 1 ORDER BY ending
      |""".stripMargin)) { (s, dir) =>
    import s.implicits._
    val e = Tables.lineitem(s, dir)
      .select(expr("CAST(CAST(l_extendedprice * 100 AS DECIMAL(38,0))" +
        " AS LONG) % 100").as("ending"))
    val gl = e.agg(count(lit(1)).as("tot"))
    val pk = broadcast(Seq(0L, 50L, 95L, 99L).toDF("k"))
    pk.join(e, lit(true), "left_outer")
      .groupBy(col("k"))
      .agg(count(when(col("ending") === col("k"), 1)).as("n_lines"))
      .crossJoin(broadcast(gl))
      .select(col("k").cast("long").as("ending"),
        col("n_lines"),
        expr("CAST((1000000 * n_lines) div tot AS BIGINT)")
          .as("share_ppm"),
        expr("CAST((100000 * n_lines) div tot AS BIGINT)")
          .as("excess_milli"))
      .orderBy(col("ending"))
  }

  /** Last-digit uniformity χ² over the OBSERVED digit cells
    * (n_cells reports how many of the 10 appear; E = N/10): χ² =
    * Σ(10·O_d − N)²/(10·N) from exact integer deviations. */
  def q1038: Q = Q(
    "q1038_last_digit_chisq",
    Some("""
      |WITH e AS (
      |  SELECT CAST(l_extendedprice * 100 AS BIGINT) % 10 AS d,
      |         count(*) AS n
      |  FROM lineitem GROUP BY 1),
      |gl AS (SELECT sum(n) AS tot, count(*) AS cells FROM e),
      |dv AS (SELECT sum(CAST(10 * n - gl.tot AS HUGEINT)
      |                  * (10 * n - gl.tot)) AS ss
      |       FROM e CROSS JOIN gl)
      |SELECT CAST((SELECT cells FROM gl) AS BIGINT) AS n_cells,
      |       CAST((SELECT tot FROM gl) AS BIGINT) AS n_lines,
      |       CAST(floor(1000.0 * CAST(ss AS DOUBLE)
      |            / (10.0 * CAST((SELECT tot FROM gl) AS DOUBLE)))
      |            AS BIGINT) AS chi2_milli
      |FROM dv
      |""".stripMargin)) { (s, dir) =>
    val e = Tables.lineitem(s, dir)
      .groupBy(expr("CAST(CAST(l_extendedprice * 100 AS DECIMAL(38,0))" +
        " AS LONG) % 10").as("d"))
      .agg(count(lit(1)).as("n"))
    val gl = e.agg(sum(col("n")).as("tot"), count(lit(1)).as("cells"))
    e.crossJoin(broadcast(gl))
      .agg(first(col("cells")).as("n_cells"),
        first(col("tot")).as("n_lines"),
        sum(expr("CAST(10 * n - tot AS DECIMAL(38,0)) * (10 * n - tot)"))
          .as("ss"))
      .select(col("n_cells").cast("long").as("n_cells"),
        col("n_lines").cast("long").as("n_lines"),
        expr("CAST(floor(1000.0 * CAST(ss AS DOUBLE)" +
          " / (10.0 * CAST(n_lines AS DOUBLE))) AS BIGINT)")
          .as("chi2_milli"))
  }

  /** Zero-ending (whole-dollar) share by market segment — does any
    * customer segment see rounder prices? */
  def q1039: Q = Q(
    "q1039_round_ending_by_segment",
    Some("""
      |WITH e AS (
      |  SELECT o.o_custkey AS ck,
      |         CASE WHEN CAST(l.l_extendedprice * 100 AS BIGINT)
      |              % 100 = 0 THEN 1 ELSE 0 END AS rnd
      |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey)
      |SELECT c.c_mktsegment AS segment,
      |       CAST(count(*) AS BIGINT) AS n_lines,
      |       CAST(sum(rnd) AS BIGINT) AS n_round,
      |       CAST((1000000 * sum(rnd)) // count(*) AS BIGINT)
      |         AS round_ppm
      |FROM e JOIN customer c ON c.c_custkey = e.ck
      |GROUP BY 1 ORDER BY segment
      |""".stripMargin)) { (s, dir) =>
    val e = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("ok"),
        when(expr("CAST(CAST(l_extendedprice * 100 AS DECIMAL(38,0))" +
          " AS LONG) % 100") === 0, 1L).otherwise(0L).as("rnd"))
      .join(Tables.orders(s, dir)
        .select(col("o_orderkey").as("ok"), col("o_custkey").as("ck")),
        "ok")
      .join(broadcast(Tables.customer(s, dir)
        .select(col("c_custkey").as("ck"),
          col("c_mktsegment").as("segment"))), "ck")
    e.groupBy(col("segment"))
      .agg(count(lit(1)).as("n_lines"), sum(col("rnd")).as("n_round"))
      .select(col("segment"), col("n_lines"), col("n_round"),
        expr("CAST((1000000 * n_round) div n_lines AS BIGINT)")
          .as("round_ppm"))
      .orderBy(col("segment"))
  }

  /** Effective tick size: share of prices on 50¢ / 25¢ / 10¢ / 5¢ /
    * 1¢ grids — the granularity ladder. */
  def q1040: Q = Q(
    "q1040_price_granularity",
    Some("""
      |WITH e AS (
      |  SELECT CAST(l_extendedprice * 100 AS BIGINT) AS cents
      |  FROM lineitem),
      |gl AS (SELECT count(*) AS tot FROM e),
      |tk AS (SELECT * FROM (VALUES (50),(25),(10),(5),(1)) v(tick))
      |SELECT CAST(tk.tick AS BIGINT) AS tick_cents,
      |       CAST(count(CASE WHEN e.cents % tk.tick = 0 THEN 1 END)
      |            AS BIGINT) AS n_on_grid,
      |       CAST((1000000 * count(CASE WHEN e.cents % tk.tick = 0
      |            THEN 1 END)) // (SELECT tot FROM gl) AS BIGINT)
      |         AS on_grid_ppm
      |FROM tk LEFT JOIN e ON 1 = 1
      |GROUP BY 1 ORDER BY tick_cents
      |""".stripMargin)) { (s, dir) =>
    import s.implicits._
    val e = Tables.lineitem(s, dir)
      .select(expr("CAST(CAST(l_extendedprice * 100 AS DECIMAL(38,0))" +
        " AS LONG)").as("cents"))
    val gl = e.agg(count(lit(1)).as("tot"))
    val tk = broadcast(Seq(50L, 25L, 10L, 5L, 1L).toDF("tick"))
    tk.join(e, lit(true), "left_outer")
      .groupBy(col("tick"))
      .agg(count(when(col("cents") % col("tick") === 0, 1))
        .as("n_on_grid"))
      .crossJoin(broadcast(gl))
      .select(col("tick").cast("long").as("tick_cents"),
        col("n_on_grid"),
        expr("CAST((1000000 * n_on_grid) div tot AS BIGINT)")
          .as("on_grid_ppm"))
      .orderBy(col("tick_cents"))
  }
}
