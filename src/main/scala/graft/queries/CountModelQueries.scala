package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables

/** Round-9 count-data modeling wave on per-(customer, year) order
  * counts INCLUDING structural zeros (customer × calendar-year grid,
  * left-joined counts): the Poisson dispersion test, negative-
  * binomial method-of-moments parameters, a zero-inflation audit
  * against the Poisson-expected zero count, Cohen's Poissonness-plot
  * slope, and the hurdle decomposition (zero share × truncated mean
  * vs the truncated-Poisson theory value).
  *
  * Scale: the grid is customers × 7 years (a left join against a
  * 7-row broadcast calendar); all moments are exact integer sums;
  * ln(k!) terms compute from exact `factorial(k)` integers (counts
  * capped at 20 by the HAVING guard, documented) with DECIMAL(18,9)
  * quantization; the only non-integer finishes are pinned doubles. */
object CountModelQueries {

  val all: Seq[Q] = Seq(q901, q902, q903, q904, q905)

  private def sqlCy: String = """
    |yrs AS (SELECT * FROM (VALUES (1995),(1996),(1997),(1998),(1999),
    |        (2000),(2001)) t(y)),
    |oc AS (SELECT o_custkey AS k, year(o_orderdate) AS y, count(*) AS c
    |       FROM orders GROUP BY 1, 2),
    |cy AS (SELECT c.c_custkey AS k, yrs.y, coalesce(oc.c, 0) AS c
    |       FROM customer c CROSS JOIN yrs
    |       LEFT JOIN oc ON oc.k = c.c_custkey AND oc.y = yrs.y),
    |mo AS (SELECT count(*) AS n, sum(c) AS s,
    |              sum(CAST(c AS HUGEINT) * c) AS q,
    |              sum(CASE WHEN c = 0 THEN 1 ELSE 0 END) AS z
    |       FROM cy)""".stripMargin

  private def cyBase(s: SparkSession, dir: String): DataFrame = {
    val yrs = s.createDataFrame((1995 to 2001).map(Tuple1(_))).toDF("y")
    val oc = Tables.orders(s, dir)
      .groupBy(col("o_custkey").as("k"),
        year(col("o_orderdate")).as("y"))
      .agg(count(lit(1)).as("c"))
    Tables.customer(s, dir).select(col("c_custkey").as("ck"))
      .crossJoin(broadcast(yrs))
      .join(oc, col("ck") === col("k") && oc("y") === yrs("y"), "left")
      .select(col("ck"), yrs("y"), coalesce(col("c"), lit(0L)).as("c"))
  }

  private def moBase(cy: DataFrame): DataFrame =
    cy.select(col("c").cast("decimal(38,0)").as("cd"), col("c"))
      .agg(count(lit(1)).as("n"), sum(col("cd")).as("s"),
        sum(col("cd") * col("cd")).as("q"),
        sum(when(col("c") === 0, 1).otherwise(0)).as("z"))

  /** Poisson dispersion: mean, variance, and the variance/mean index
    * (1 under Poisson). */
  def q901: Q = Q(
    "q901_poisson_dispersion",
    Some(s"""
      |WITH ${sqlCy}
      |SELECT CAST(n AS BIGINT) AS n_cells,
      |       CAST((1000 * s) // n AS BIGINT) AS mean_milli,
      |       CAST(floor(1000.0 * CAST(n * q - s * s AS DOUBLE)
      |            / (CAST(n AS DOUBLE) * (n - 1))) AS BIGINT)
      |         AS var_milli,
      |       CAST(floor(1000.0 * (CAST(n * q - s * s AS DOUBLE)
      |            / (CAST(n AS DOUBLE) * (n - 1)))
      |            / (CAST(s AS DOUBLE) / n)) AS BIGINT)
      |         AS dispersion_index_milli
      |FROM mo
      |""".stripMargin)) { (s, dir) =>
    moBase(cyBase(s, dir))
      .select(col("n").cast("long").as("n_cells"),
        expr("CAST((1000 * s) div n AS BIGINT)").as("mean_milli"),
        expr("""CAST(floor(1000.0 * CAST(n * q - s * s AS DOUBLE)
          |  / (CAST(n AS DOUBLE) * (n - 1))) AS BIGINT)""".stripMargin)
          .as("var_milli"),
        expr("""CAST(floor(1000.0 * (CAST(n * q - s * s AS DOUBLE)
          |  / (CAST(n AS DOUBLE) * (n - 1))) / (CAST(s AS DOUBLE) / n))
          |  AS BIGINT)""".stripMargin).as("dispersion_index_milli"))
  }

  /** Negative-binomial method of moments: r = μ²/(σ²−μ), p = μ/σ². */
  def q902: Q = Q(
    "q902_negbin_moments",
    Some(s"""
      |WITH ${sqlCy}
      |SELECT CAST(floor(1000.0 * (CAST(s AS DOUBLE) / n)
      |            * (CAST(s AS DOUBLE) / n)
      |            / (CAST(n * q - s * s AS DOUBLE)
      |               / (CAST(n AS DOUBLE) * (n - 1))
      |               - CAST(s AS DOUBLE) / n)) AS BIGINT) AS r_milli,
      |       CAST(floor(1000.0 * (CAST(s AS DOUBLE) / n)
      |            / (CAST(n * q - s * s AS DOUBLE)
      |               / (CAST(n AS DOUBLE) * (n - 1)))) AS BIGINT)
      |         AS p_milli
      |FROM mo
      |""".stripMargin)) { (s, dir) =>
    moBase(cyBase(s, dir))
      .select(
        expr("""CAST(floor(1000.0 * (CAST(s AS DOUBLE) / n)
          |  * (CAST(s AS DOUBLE) / n)
          |  / (CAST(n * q - s * s AS DOUBLE)
          |     / (CAST(n AS DOUBLE) * (n - 1)) - CAST(s AS DOUBLE) / n))
          |  AS BIGINT)""".stripMargin).as("r_milli"),
        expr("""CAST(floor(1000.0 * (CAST(s AS DOUBLE) / n)
          |  / (CAST(n * q - s * s AS DOUBLE)
          |     / (CAST(n AS DOUBLE) * (n - 1)))) AS BIGINT)"""
          .stripMargin).as("p_milli"))
  }

  /** Zero inflation: observed zeros vs the Poisson expectation
    * n·e^{−μ} and the excess-zero share. */
  def q903: Q = Q(
    "q903_zero_inflation",
    Some(s"""
      |WITH ${sqlCy}
      |SELECT CAST(z AS BIGINT) AS observed_zeros,
      |       CAST(floor(n * exp(-(CAST(s AS DOUBLE) / n))) AS BIGINT)
      |         AS poisson_expected_zeros,
      |       CAST(floor(1000.0 * (z - n * exp(-(CAST(s AS DOUBLE) / n)))
      |            / n) AS BIGINT) AS excess_zero_share_milli
      |FROM mo
      |""".stripMargin)) { (s, dir) =>
    moBase(cyBase(s, dir))
      .select(col("z").cast("long").as("observed_zeros"),
        expr("CAST(floor(n * exp(-(CAST(s AS DOUBLE) / n))) AS BIGINT)")
          .as("poisson_expected_zeros"),
        expr("""CAST(floor(1000.0
          |  * (z - n * exp(-(CAST(s AS DOUBLE) / n))) / n) AS BIGINT)"""
          .stripMargin).as("excess_zero_share_milli"))
  }

  /** Cohen's Poissonness plot: OLS slope of ln(k!·n_k/n) on k —
    * exp(slope) estimates μ under Poisson. */
  def q904: Q = Q(
    "q904_poissonness_plot",
    Some(s"""
      |WITH ${sqlCy},
      |hk AS (SELECT c AS kk, count(*) AS nk FROM cy
      |       GROUP BY 1 HAVING c <= 20),
      |lt AS (SELECT CAST(kk AS DECIMAL(18,9)) AS x,
      |              CAST(ln(CAST(factorial(CAST(kk AS INT)) AS DOUBLE)
      |                      * nk / (SELECT n FROM mo))
      |                   AS DECIMAL(18,9)) AS yv
      |       FROM hk),
      |ols AS (SELECT count(*) AS np, sum(x) AS sx, sum(yv) AS sy,
      |               sum(x * yv) AS sxy, sum(x * x) AS sxx FROM lt)
      |SELECT CAST(np AS BIGINT) AS n_points,
      |       CAST(floor(1000.0 * CAST(np * sxy - sx * sy AS DOUBLE)
      |            / CAST(np * sxx - sx * sx AS DOUBLE)) AS BIGINT)
      |         AS slope_milli,
      |       CAST(floor(1000.0 * exp(CAST(np * sxy - sx * sy AS DOUBLE)
      |            / CAST(np * sxx - sx * sx AS DOUBLE))) AS BIGINT)
      |         AS implied_mu_milli
      |FROM ols
      |""".stripMargin)) { (s, dir) =>
    val cy = cyBase(s, dir).materialize()
    val mo = moBase(cy).select(col("n"))
    val lt = cy.groupBy(col("c").as("kk")).agg(count(lit(1)).as("nk"))
      .where(col("kk") <= 20)
      .crossJoin(broadcast(mo))
      .select(col("kk").cast("decimal(18,9)").as("x"),
        expr("""CAST(ln(CAST(factorial(CAST(kk AS INT)) AS DOUBLE)
          |  * nk / n) AS DECIMAL(18,9))""".stripMargin).as("yv"))
    lt.agg(count(lit(1)).as("np"), sum(col("x")).as("sx"),
        sum(col("yv")).as("sy"), sum(col("x") * col("yv")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("np").cast("long").as("n_points"),
        expr("""CAST(floor(1000.0 * CAST(np * sxy - sx * sy AS DOUBLE)
          |  / CAST(np * sxx - sx * sx AS DOUBLE)) AS BIGINT)"""
          .stripMargin).as("slope_milli"),
        expr("""CAST(floor(1000.0 * exp(CAST(np * sxy - sx * sy AS DOUBLE)
          |  / CAST(np * sxx - sx * sx AS DOUBLE))) AS BIGINT)"""
          .stripMargin).as("implied_mu_milli"))
  }

  /** Hurdle decomposition: zero share, truncated (positive-only)
    * mean, and the truncated-Poisson theory mean μ/(1−e^{−μ}). */
  def q905: Q = Q(
    "q905_hurdle_decomposition",
    Some(s"""
      |WITH ${sqlCy}
      |SELECT CAST((1000 * z) // n AS BIGINT) AS zero_share_milli,
      |       CAST((1000 * s) // (n - z) AS BIGINT)
      |         AS truncated_mean_milli,
      |       CAST(floor(1000.0 * (CAST(s AS DOUBLE) / n)
      |            / (1.0 - exp(-(CAST(s AS DOUBLE) / n)))) AS BIGINT)
      |         AS theory_trunc_mean_milli
      |FROM mo
      |""".stripMargin)) { (s, dir) =>
    moBase(cyBase(s, dir))
      .select(expr("CAST((1000 * z) div n AS BIGINT)")
        .as("zero_share_milli"),
        expr("CAST((1000 * s) div (n - z) AS BIGINT)")
          .as("truncated_mean_milli"),
        expr("""CAST(floor(1000.0 * (CAST(s AS DOUBLE) / n)
          |  / (1.0 - exp(-(CAST(s AS DOUBLE) / n)))) AS BIGINT)"""
          .stripMargin).as("theory_trunc_mean_milli"))
  }
}
