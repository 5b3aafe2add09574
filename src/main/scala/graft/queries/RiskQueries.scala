package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables

/** Round-8 risk wave over the signed daily net-revenue series
  * (returned lines count negative): maximum drawdown + ulcer index,
  * Omega/Sortino ratios around the median target, expected shortfall
  * (CVaR), and the measurement-agreement pair on order value measured
  * two ways (Bland–Altman limits of agreement, Deming λ=1
  * errors-in-variables fit vs the OLS slope). Day-dim windows are
  * calendar-bounded; every statistic is exact integer sums with
  * pinned-double finals. */
object RiskQueries {

  val all: Seq[Q] = Seq(q596, q597, q598, q599, q600)

  /** Signed daily net revenue in cents over OBSERVED ship days (the
    * drawdown/ratio contract is the observed-day series; gap days
    * cannot change any cumulative value, only the day count, and both
    * engines see the same days). */
  private def dailyNetSql: String = DailyNet.sql

  private def dailyNet(s: SparkSession, dir: String): DataFrame =
    DailyNet.frame(s, dir)

  /** Maximum drawdown and ulcer index of the cumulative net-revenue
    * equity curve: running max M (anchored at 0), drawdown D = M − E,
    * worst drawdown with its FIRST day, and the ulcer index
    * √(mean((10⁶·D/M)²)) over days with a positive peak. Cumulative
    * and running-max windows ride the calendar-bounded day dim. */
  def q596: Q = Q(
    "q596_max_drawdown_ulcer",
    Some(s"""
      |WITH ${dailyNetSql},
      |eq AS (
      |  SELECT day,
      |         sum(net) OVER (ORDER BY day) AS e
      |  FROM d),
      |mm AS (
      |  SELECT day, e,
      |         greatest(max(e) OVER (ORDER BY day), 0) AS m
      |  FROM eq),
      |dd AS (SELECT day, m, m - e AS drawdown FROM mm),
      |mx AS (SELECT max(drawdown) AS maxdd FROM dd),
      |fd AS (SELECT min(day) AS dd_day FROM dd CROSS JOIN mx
      |       WHERE drawdown = mx.maxdd),
      |ul AS (
      |  SELECT count(*) AS np,
      |         sum(CAST(r AS HUGEINT) * r) AS s2
      |  FROM (SELECT (1000000 * drawdown) // m AS r FROM dd WHERE m > 0))
      |SELECT CAST((SELECT count(*) FROM d) AS BIGINT) AS n_days,
      |       CAST(mx.maxdd AS BIGINT) AS max_dd_cents,
      |       CAST(fd.dd_day AS BIGINT) AS max_dd_day,
      |       CAST(floor(sqrt(CAST(ul.s2 AS DOUBLE)
      |         / CAST(ul.np AS DOUBLE))) AS BIGINT) AS ulcer_ppm
      |FROM mx CROSS JOIN fd CROSS JOIN ul
      |""".stripMargin)) { (s, dir) =>
    val d = dailyNet(s, dir).materialize()
    val wCum = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dd = d
      .withColumn("e", sum(col("net")).over(wCum))
      .withColumn("m", greatest(max(col("e")).over(wCum), lit(0)))
      .select(col("day"), col("m"), (col("m") - col("e")).as("drawdown"))
      .materialize() // feeds the max, the argmax, and the ulcer sum
    val mx = dd.agg(max(col("drawdown")).as("maxdd"))
    val fd = dd.crossJoin(broadcast(mx))
      .where(col("drawdown") === col("maxdd"))
      .agg(min(col("day")).as("dd_day"))
    val ul = dd.where(col("m") > 0)
      .select(expr("(1000000 * CAST(drawdown AS BIGINT))" +
        " div CAST(m AS BIGINT)").as("r"))
      .agg(count(lit(1)).as("np"),
        sum(expr("CAST(r AS DECIMAL(38,0)) * r")).as("s2"))
    val nd = d.agg(count(lit(1)).as("n_days"))
    mx.crossJoin(broadcast(fd)).crossJoin(broadcast(ul))
      .crossJoin(broadcast(nd))
      .select(col("n_days"), col("maxdd").cast("long").as("max_dd_cents"),
        col("dd_day").as("max_dd_day"),
        expr("CAST(floor(sqrt(CAST(s2 AS DOUBLE) / CAST(np AS DOUBLE)))" +
          " AS BIGINT)").as("ulcer_ppm"))
  }

  /** Omega and Sortino ratios of daily net revenue around the MEDIAN
    * target (exact order statistic): Ω = Σ(v−τ)⁺ / Σ(τ−v)⁺ and
    * Sortino = (v̄−τ)/√(mean((τ−v)⁺²)) — the gain/loss asymmetry
    * pair a symmetric sd hides. Exact integer gain/loss/downside
    * sums; two pinned-double finals. */
  def q597: Q = Q(
    "q597_omega_sortino_daily",
    Some(s"""
      |WITH ${dailyNetSql},
      |tau AS (
      |  SELECT max(CASE WHEN rn = (500 * n + 999) // 1000 THEN net END)
      |           AS t
      |  FROM (SELECT net, row_number() OVER (ORDER BY net) AS rn,
      |               count(*) OVER () AS n FROM d) r),
      |ag AS (
      |  SELECT count(*) AS n, sum(net) AS sv,
      |         sum(greatest(net - tau.t, 0)) AS gains,
      |         sum(greatest(tau.t - net, 0)) AS losses,
      |         sum(CAST(greatest(tau.t - net, 0) AS HUGEINT)
      |             * greatest(tau.t - net, 0)) AS d2
      |  FROM d CROSS JOIN tau)
      |SELECT CAST(ag.n AS BIGINT) AS n_days,
      |       CAST(tau.t AS BIGINT) AS tau_cents,
      |       CAST(floor(CAST(ag.gains AS DOUBLE)
      |         / CAST(ag.losses AS DOUBLE) * 1000.0) AS BIGINT)
      |         AS omega_milli,
      |       CAST(floor(CAST(ag.sv - ag.n * tau.t AS DOUBLE) / ag.n
      |         / sqrt(CAST(ag.d2 AS DOUBLE) / ag.n) * 1000.0) AS BIGINT)
      |         AS sortino_milli
      |FROM ag CROSS JOIN tau
      |""".stripMargin)) { (s, dir) =>
    val d = dailyNet(s, dir).materialize()
    val tau = graft.operators.OrderStats.quantilesDisc(
        d.withColumn("k", lit(0L)), Seq("k"), "net", Seq(500))
      .select(col("value").as("t"))
    val ag = d.crossJoin(broadcast(tau))
      .agg(count(lit(1)).as("n"), sum(col("net")).as("sv"),
        sum(greatest(col("net") - col("t"), lit(0))).as("gains"),
        sum(greatest(col("t") - col("net"), lit(0))).as("losses"),
        sum(expr("CAST(greatest(t - net, 0) AS DECIMAL(38,0))" +
          " * greatest(t - net, 0)")).as("d2"),
        max(col("t")).as("t"))
    ag.select(col("n").as("n_days"), col("t").cast("long").as("tau_cents"),
      expr("CAST(floor(CAST(gains AS DOUBLE) / CAST(losses AS DOUBLE)" +
        " * 1000.0) AS BIGINT)").as("omega_milli"),
      expr("CAST(floor(CAST(sv - n * t AS DOUBLE) / n" +
        " / sqrt(CAST(d2 AS DOUBLE) / n) * 1000.0) AS BIGINT)")
        .as("sortino_milli"))
  }

  /** Expected shortfall (CVaR) of daily net revenue at the 10% level:
    * VaR = the 100‰ lower order statistic, ES = the mean of the tail
    * at or below it — the coherent tail measure a VaR point estimate
    * understates. Exact tail sum; the mean is one pinned-double floor
    * (signed sums never ride integer division). */
  def q598: Q = Q(
    "q598_expected_shortfall",
    Some(s"""
      |WITH ${dailyNetSql},
      |v AS (
      |  SELECT max(CASE WHEN rn = (100 * n + 999) // 1000 THEN net END)
      |           AS var10
      |  FROM (SELECT net, row_number() OVER (ORDER BY net) AS rn,
      |               count(*) OVER () AS n FROM d) r),
      |tl AS (SELECT count(*) AS c, sum(net) AS sn
      |       FROM d CROSS JOIN v WHERE net <= v.var10)
      |SELECT CAST((SELECT count(*) FROM d) AS BIGINT) AS n_days,
      |       CAST(v.var10 AS BIGINT) AS var10_cents,
      |       CAST(tl.c AS BIGINT) AS n_tail,
      |       CAST(floor(CAST(tl.sn AS DOUBLE) / CAST(tl.c AS DOUBLE))
      |         AS BIGINT) AS es_cents
      |FROM v CROSS JOIN tl
      |""".stripMargin)) { (s, dir) =>
    val d = dailyNet(s, dir).materialize()
    val v = graft.operators.OrderStats.quantilesDisc(
        d.withColumn("k", lit(0L)), Seq("k"), "net", Seq(100))
      .select(col("value").as("var10"))
    val tl = d.crossJoin(broadcast(v))
      .where(col("net") <= col("var10"))
      .agg(count(lit(1)).as("c"), sum(col("net")).as("sn"),
        max(col("var10")).as("var10"))
    val nd = d.agg(count(lit(1)).as("n_days"))
    tl.crossJoin(broadcast(nd))
      .select(col("n_days"), col("var10").cast("long").as("var10_cents"),
        col("c").as("n_tail"),
        expr("CAST(floor(CAST(sn AS DOUBLE) / CAST(c AS DOUBLE))" +
          " AS BIGINT)").as("es_cents"))
  }

  /** Order value measured two ways per order: A = the header
    * o_totalprice, B = Σ line extendedprice (the synthetic generator
    * draws them independently, so they disagree like two instruments
    * would). Shared by the agreement pair. */
  private def abSql: String = """
    |ab AS (
    |  SELECT o.o_orderkey AS id,
    |         CAST(any_value(o.o_totalprice) * 100 AS HUGEINT) AS a,
    |         sum(CAST(l.l_extendedprice * 100 AS HUGEINT)) AS b
    |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    |  GROUP BY 1)""".stripMargin

  private def abBase(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey").as("id"),
        expr("CAST(o_totalprice * 100 AS DECIMAL(38,0))").as("a"))
      .join(Tables.lineitem(s, dir).select(col("l_orderkey"),
        expr("CAST(l_extendedprice * 100 AS DECIMAL(38,0))").as("lc")),
        col("id") === col("l_orderkey"))
      .groupBy(col("id"), col("a")).agg(sum(col("lc")).as("b"))

  /** Bland–Altman agreement of the two order-value measures: bias
    * = mean difference, limits of agreement = bias ± 2·sd (sample sd
    * from exact centered moments), and the share of orders inside the
    * limits — the agreement audit a correlation coefficient cannot
    * substitute for. The double limits are computed ONCE in the same
    * pinned expression both engines evaluate, then compared against
    * exact integer differences. */
  def q599: Q = {
    val meanExpr = "CAST(sd_ AS DOUBLE) / CAST(n AS DOUBLE)"
    val sdExpr = "sqrt(CAST(CAST(n AS HUGEINT) * q2" +
      " - CAST(sd_ AS HUGEINT) * sd_ AS DOUBLE)" +
      " / (CAST(n AS DOUBLE) * (n - 1)))"
    val sdExprSpark = sdExpr.replace("HUGEINT", "DECIMAL(38,0)")
    Q("q599_bland_altman_order_value",
      Some(s"""
        |WITH ${abSql},
        |df AS (SELECT id, a - b AS d FROM ab),
        |mo AS (SELECT count(*) AS n, sum(d) AS sd_,
        |              sum(CAST(d AS HUGEINT) * d) AS q2 FROM df),
        |cv AS (SELECT count(*) AS within FROM df CROSS JOIN mo
        |       WHERE CAST(d AS DOUBLE) >= $meanExpr - 2.0 * $sdExpr
        |         AND CAST(d AS DOUBLE) <= $meanExpr + 2.0 * $sdExpr)
        |SELECT CAST(mo.n AS BIGINT) AS n_orders,
        |       CAST(floor($meanExpr) AS BIGINT) AS bias_cents,
        |       CAST(floor($meanExpr - 2.0 * $sdExpr) AS BIGINT)
        |         AS loa_lo_cents,
        |       CAST(floor($meanExpr + 2.0 * $sdExpr) AS BIGINT)
        |         AS loa_hi_cents,
        |       CAST((1000 * cv.within) // mo.n AS BIGINT)
        |         AS within_permille
        |FROM mo CROSS JOIN cv
        |""".stripMargin)) { (s, dir) =>
      val df = abBase(s, dir).select((col("a") - col("b")).as("d"))
        .materialize()
      val mo = df.agg(count(lit(1)).as("n"), sum(col("d")).as("sd_"),
        sum(expr("CAST(d AS DECIMAL(38,0)) * d")).as("q2"))
      val cv = df.crossJoin(broadcast(mo))
        .where(expr(s"CAST(d AS DOUBLE) >= $meanExpr - 2.0 * $sdExprSpark" +
          s" AND CAST(d AS DOUBLE) <= $meanExpr + 2.0 * $sdExprSpark"))
        .agg(count(lit(1)).as("within"))
      mo.crossJoin(broadcast(cv))
        .select(col("n").as("n_orders"),
          expr(s"CAST(floor($meanExpr) AS BIGINT)").as("bias_cents"),
          expr(s"CAST(floor($meanExpr - 2.0 * $sdExprSpark) AS BIGINT)")
            .as("loa_lo_cents"),
          expr(s"CAST(floor($meanExpr + 2.0 * $sdExprSpark) AS BIGINT)")
            .as("loa_hi_cents"),
          expr("CAST((1000 * within) div n AS BIGINT)")
            .as("within_permille"))
    }
  }

  /** Deming (λ = 1) errors-in-variables slope between the two order
    * value measures, against the naive OLS slope: when BOTH variables
    * carry noise, OLS attenuates toward zero while Deming
    * β = (S_yy − S_xx + √((S_yy−S_xx)² + 4S_xy²)) / 2S_xy does not —
    * the attenuation gap is the output. Centered moments exact in
    * HUGEINT; the discriminant is squared in double (pinned, same
    * op order both engines). */
  def q600: Q = {
    val demExpr = "(CAST(syy AS DOUBLE) - CAST(sxx AS DOUBLE)" +
      " + sqrt((CAST(syy AS DOUBLE) - CAST(sxx AS DOUBLE))" +
      " * (CAST(syy AS DOUBLE) - CAST(sxx AS DOUBLE))" +
      " + 4.0 * CAST(sxy AS DOUBLE) * CAST(sxy AS DOUBLE)))" +
      " / (2.0 * CAST(sxy AS DOUBLE))"
    val olsExpr = "CAST(sxy AS DOUBLE) / CAST(sxx AS DOUBLE)"
    Q("q600_deming_order_value",
      Some(s"""
        |WITH ${abSql},
        |mo AS (
        |  SELECT count(*) AS n, sum(b) AS sx, sum(a) AS sy,
        |         sum(b * b) AS qx, sum(a * a) AS qy, sum(b * a) AS qxy
        |  FROM ab),
        |cs AS (
        |  SELECT n,
        |    CAST(n AS HUGEINT) * qx - sx * sx AS sxx,
        |    CAST(n AS HUGEINT) * qy - sy * sy AS syy,
        |    CAST(n AS HUGEINT) * qxy - sx * sy AS sxy
        |  FROM mo)
        |SELECT CAST(n AS BIGINT) AS n_orders,
        |       CAST(floor(CAST($demExpr AS DECIMAL(28,6)) * 1000)
        |         AS BIGINT) AS deming_slope_milli,
        |       CAST(floor(CAST($olsExpr AS DECIMAL(28,6)) * 1000)
        |         AS BIGINT) AS ols_slope_milli
        |FROM cs
        |""".stripMargin)) { (s, dir) =>
      val mo = abBase(s, dir)
        .agg(count(lit(1)).as("n"), sum(col("b")).as("sx"),
          sum(col("a")).as("sy"), sum(col("b") * col("b")).as("qx"),
          sum(col("a") * col("a")).as("qy"),
          sum(col("b") * col("a")).as("qxy"))
      mo.select(col("n"),
          expr("CAST(n AS DECIMAL(38,0)) * qx - sx * sx").as("sxx"),
          expr("CAST(n AS DECIMAL(38,0)) * qy - sy * sy").as("syy"),
          expr("CAST(n AS DECIMAL(38,0)) * qxy - sx * sy").as("sxy"))
        .select(col("n").as("n_orders"),
          expr(s"CAST(floor(CAST($demExpr AS DECIMAL(28,6)) * 1000)" +
            " AS BIGINT)").as("deming_slope_milli"),
          expr(s"CAST(floor(CAST($olsExpr AS DECIMAL(28,6)) * 1000)" +
            " AS BIGINT)").as("ols_slope_milli"))
    }
  }
}
