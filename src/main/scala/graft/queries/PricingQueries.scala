package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables

/** Round-9 pricing-microeconomics wave (the cross-sectional sibling of
  * q563's time-series elasticity): part-level log-log demand
  * elasticity, the discount-bucket demand response curve, the linear
  * discount-quantity slope, a law-of-one-price dispersion audit, and
  * the discounted-revenue response by discount bucket.
  *
  * Scale: one fact pass to part-level aggregates (unit price from
  * exact cent/quantity sums) or discount-bucket dims (11 groups).
  * ln terms are DECIMAL(18,9)-quantized; OLS terms exact; discount
  * percments come from the established round-to-int double cast. */
object PricingQueries {

  val all: Seq[Q] = Seq(q941, q942, q943, q944, q945)

  /** Oracle part-level unit price/quantity `pp(part, upm, qty)`. */
  private def sqlPp: String = """
    |pp AS (
    |  SELECT l_partkey AS part,
    |         (10000 * sum(CAST(l_extendedprice * 100 AS BIGINT)))
    |           // sum(CAST(l_quantity AS BIGINT)) AS upm,
    |         sum(CAST(l_quantity AS BIGINT)) AS qty
    |  FROM lineitem GROUP BY 1)""".stripMargin

  private def ppBase(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_partkey").as("part"),
        expr("CAST(CAST(l_extendedprice * 100 AS DECIMAL(38,0)) AS LONG)")
          .as("v"), col("l_quantity").cast("long").as("q"))
      .groupBy(col("part"))
      .agg(sum(col("v")).as("sv"), sum(col("q")).as("qty"))
      .select(col("part"), expr("(10000 * sv) div qty").as("upm"),
        col("qty"))

  /** Cross-sectional demand elasticity: ln(qty) on ln(unit price)
    * across parts. */
  def q941: Q = Q(
    "q941_cross_elasticity",
    Some(s"""
      |WITH ${sqlPp},
      |lt AS (SELECT CAST(ln(CAST(upm AS DOUBLE)) AS DECIMAL(18,9)) AS x,
      |              CAST(ln(CAST(qty AS DOUBLE)) AS DECIMAL(18,9)) AS y
      |       FROM pp),
      |mo AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
      |              sum(x * y) AS sxy, sum(x * x) AS sxx FROM lt)
      |SELECT CAST(n AS BIGINT) AS n_parts,
      |       CAST(floor(1000.0 * CAST(n * sxy - sx * sy AS DOUBLE)
      |            / CAST(n * sxx - sx * sx AS DOUBLE)) AS BIGINT)
      |         AS elasticity_milli
      |FROM mo
      |""".stripMargin)) { (s, dir) =>
    ppBase(s, dir)
      .select(expr("CAST(ln(CAST(upm AS DOUBLE)) AS DECIMAL(18,9))")
        .as("x"),
        expr("CAST(ln(CAST(qty AS DOUBLE)) AS DECIMAL(18,9))").as("y"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("n").cast("long").as("n_parts"),
        expr("""CAST(floor(1000.0 * CAST(n * sxy - sx * sy AS DOUBLE)
          |  / CAST(n * sxx - sx * sx AS DOUBLE)) AS BIGINT)"""
          .stripMargin).as("elasticity_milli"))
  }

  /** Discount response curve: mean quantity per discount percent. */
  def q942: Q = Q(
    "q942_discount_response",
    Some("""
      |WITH db AS (
      |  SELECT CAST(l_discount * 100 AS BIGINT) AS pct,
      |         CAST(l_quantity AS BIGINT) AS q
      |  FROM lineitem)
      |SELECT CAST(pct AS BIGINT) AS discount_pct,
      |       CAST(count(*) AS BIGINT) AS n_items,
      |       CAST((1000 * sum(q)) // count(*) AS BIGINT)
      |         AS mean_qty_milli
      |FROM db GROUP BY 1 ORDER BY discount_pct
      |""".stripMargin)) { (s, dir) =>
    Tables.lineitem(s, dir)
      .select(expr("CAST(CAST(l_discount * 100 AS DECIMAL(38,0))" +
        " AS LONG)").as("pct"),
        col("l_quantity").cast("long").as("q"))
      .groupBy(col("pct").as("discount_pct"))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("sq"))
      .select(col("discount_pct").cast("long").as("discount_pct"),
        col("n").cast("long").as("n_items"),
        expr("CAST((1000 * sq) div n AS BIGINT)").as("mean_qty_milli"))
      .orderBy(col("discount_pct"))
  }

  /** Linear discount-quantity slope across lineitems (exact OLS). */
  def q943: Q = Q(
    "q943_discount_slope",
    Some("""
      |WITH db AS (
      |  SELECT CAST(l_discount * 100 AS BIGINT) AS x,
      |         CAST(l_quantity AS BIGINT) AS y
      |  FROM lineitem),
      |mo AS (SELECT count(*) AS n, sum(CAST(x AS HUGEINT)) AS sx,
      |              sum(CAST(y AS HUGEINT)) AS sy,
      |              sum(CAST(x AS HUGEINT) * y) AS sxy,
      |              sum(CAST(x AS HUGEINT) * x) AS sxx FROM db)
      |SELECT CAST(n AS BIGINT) AS n_items,
      |       CAST(floor(1000.0 * CAST(n * sxy - sx * sy AS DOUBLE)
      |            / CAST(n * sxx - sx * sx AS DOUBLE)) AS BIGINT)
      |         AS qty_per_pct_milli
      |FROM mo
      |""".stripMargin)) { (s, dir) =>
    Tables.lineitem(s, dir)
      .select(expr("CAST(CAST(l_discount * 100 AS DECIMAL(38,0))" +
        " AS LONG)").cast("decimal(38,0)").as("x"),
        col("l_quantity").cast("decimal(38,0)").as("y"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("n").cast("long").as("n_items"),
        expr("""CAST(floor(1000.0 * CAST(n * sxy - sx * sy AS DOUBLE)
          |  / CAST(n * sxx - sx * sx AS DOUBLE)) AS BIGINT)"""
          .stripMargin).as("qty_per_pct_milli"))
  }

  /** Law-of-one-price audit: per part (≥5 items) the CV of per-item
    * unit price; mean CV and the high-dispersion (CV > 10%) count. */
  def q944: Q = Q(
    "q944_price_dispersion",
    Some("""
      |WITH up AS (
      |  SELECT l_partkey AS part,
      |         (10000 * CAST(l_extendedprice * 100 AS BIGINT))
      |           // CAST(l_quantity AS BIGINT) AS u
      |  FROM lineitem),
      |pv AS (SELECT part, count(*) AS n, sum(CAST(u AS HUGEINT)) AS s,
      |              sum(CAST(u AS HUGEINT) * u) AS q
      |       FROM up GROUP BY 1 HAVING count(*) >= 5),
      |cv AS (SELECT CAST(floor(1000.0
      |         * sqrt(CAST(n * q - s * s AS DOUBLE)
      |                / (CAST(n AS DOUBLE) * (n - 1)))
      |         / (CAST(s AS DOUBLE) / n)) AS BIGINT) AS c FROM pv)
      |SELECT CAST(count(*) AS BIGINT) AS n_parts,
      |       CAST(sum(c) // count(*) AS BIGINT) AS mean_cv_milli,
      |       CAST(sum(CASE WHEN c > 100 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_high_dispersion
      |FROM cv
      |""".stripMargin)) { (s, dir) =>
    Tables.lineitem(s, dir)
      .select(col("l_partkey").as("part"),
        expr("(10000 * CAST(CAST(l_extendedprice * 100" +
          " AS DECIMAL(38,0)) AS LONG)) div" +
          " CAST(l_quantity AS LONG)").as("u"))
      .groupBy(col("part"))
      .agg(count(lit(1)).as("n"),
        sum(col("u").cast("decimal(38,0)")).as("s"),
        sum(col("u").cast("decimal(38,0)") * col("u")).as("q"))
      .where(col("n") >= 5)
      .select(expr("""CAST(floor(1000.0
        |  * sqrt(CAST(n * q - s * s AS DOUBLE)
        |         / (CAST(n AS DOUBLE) * (n - 1)))
        |  / (CAST(s AS DOUBLE) / n)) AS BIGINT)""".stripMargin).as("c"))
      .agg(count(lit(1)).as("np"), sum(col("c")).as("sc"),
        sum(when(col("c") > 100, 1).otherwise(0)).as("hi"))
      .select(col("np").cast("long").as("n_parts"),
        expr("CAST(sc div np AS BIGINT)").as("mean_cv_milli"),
        col("hi").cast("long").as("n_high_dispersion"))
  }

  /** Discounted-revenue response: mean after-discount cents per item
    * by discount percent — where the revenue curve peaks. */
  def q945: Q = Q(
    "q945_revenue_response",
    Some("""
      |WITH db AS (
      |  SELECT CAST(l_discount * 100 AS BIGINT) AS pct,
      |         CAST(l_extendedprice * (1 - l_discount) * 100 AS BIGINT)
      |           AS rc
      |  FROM lineitem)
      |SELECT CAST(pct AS BIGINT) AS discount_pct,
      |       CAST(count(*) AS BIGINT) AS n_items,
      |       CAST(sum(CAST(rc AS HUGEINT)) // count(*) AS BIGINT)
      |         AS mean_discounted_cents
      |FROM db GROUP BY 1 ORDER BY discount_pct
      |""".stripMargin)) { (s, dir) =>
    Tables.lineitem(s, dir)
      .select(expr("CAST(CAST(l_discount * 100 AS DECIMAL(38,0))" +
        " AS LONG)").as("pct"),
        expr("CAST(CAST(l_extendedprice * (1 - l_discount) * 100" +
          " AS DECIMAL(38,0)) AS LONG)").as("rc"))
      .groupBy(col("pct").as("discount_pct"))
      .agg(count(lit(1)).as("n"),
        sum(col("rc").cast("decimal(38,0)")).as("sr"))
      .select(col("discount_pct").cast("long").as("discount_pct"),
        col("n").cast("long").as("n_items"),
        expr("CAST((sr - sr % n) / n AS DECIMAL(38,0))").cast("long")
          .as("mean_discounted_cents"))
      .orderBy(col("discount_pct"))
  }
}
