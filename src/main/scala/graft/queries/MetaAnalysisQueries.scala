package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables

/** Round-11 meta-analysis wave: each customer nation is a "study" of
  * the urgent-vs-routine order-value effect (mean totalprice
  * difference, high priority minus the rest) — fixed-effect
  * inverse-variance pooling, Cochran's Q and I² heterogeneity,
  * leave-one-study-out sensitivity, Egger's funnel-asymmetry
  * regression, and the DerSimonian–Laird random-effects model.
  *
  * Exactness: per-study moments (n, Σv, Σv² in cents) are exact
  * integers; each study's effect d (dollars) and Welch variance se²
  * are ONE shared-text double step FLOOR-quantized to micro-unit
  * BIGINTs (floor of an identical double is engine-identical, where
  * a DECIMAL cast's tie-rounding is NOT — this wave measured the
  * divergence), and EVERY downstream per-study term (×10¹⁵-scaled
  * inverse-variance weights, Egger z/precision, DL random-effects
  * weights) is floor-quantized to an integer before its order-free
  * exact sum; final statistics are single shared-text double steps.
  * Studies need n≥2 in both arms (stated WHERE both sides).
  *
  * Scale: one orders scan joins customer (hash, nation key) and the
  * broadcast nation dim, collapsing to the ≤25-study moment dim;
  * everything downstream is study-dim. */
object MetaAnalysisQueries {

  val all: Seq[Q] = Seq(q1081, q1082, q1083, q1084, q1085)

  /** Oracle study frame: st(nat, d6, se26) — micro-dollar effect and
    * micro-dollars² variance as floored integers. */
  private def sqlSt: String = """
    |base AS (
    |  SELECT n.n_name AS nat,
    |         CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
    |              THEN 1 ELSE 0 END AS hp,
    |         CAST(o.o_totalprice * 100 AS BIGINT) AS v
    |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    |  JOIN nation n ON n.n_nationkey = c.c_nationkey),
    |mom AS (
    |  SELECT nat,
    |         sum(hp) AS n1, sum(hp * v) AS s1,
    |         sum(hp * CAST(v AS HUGEINT) * v) AS q1,
    |         sum(1 - hp) AS n0, sum((1 - hp) * v) AS s0,
    |         sum((1 - hp) * CAST(v AS HUGEINT) * v) AS q0
    |  FROM base GROUP BY 1),
    |st AS (
    |  SELECT nat,
    |         CAST(floor(1e6 * (CAST(s1 AS DOUBLE) / n1
    |              - CAST(s0 AS DOUBLE) / n0) / 100) AS BIGINT) AS d6,
    |         CAST(floor(1000000.0
    |            * (CAST(n1 * q1 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
    |                 / (CAST(n1 AS DOUBLE) * n1 * (n1 - 1))
    |               + CAST(n0 * q0 - CAST(s0 AS HUGEINT) * s0 AS DOUBLE)
    |                 / (CAST(n0 AS DOUBLE) * n0 * (n0 - 1)))
    |              / 10000) AS BIGINT) AS se26
    |  FROM mom WHERE n1 > 1 AND n0 > 1)""".stripMargin

  /** Spark twin: study frame (nat, d6, se26). */
  private def stFrame(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(s, dir)
      .select(col("o_custkey").as("ck"),
        expr("CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')" +
          " THEN 1 ELSE 0 END").as("hp"),
        expr("CAST(CAST(o_totalprice * 100 AS DECIMAL(38,0))" +
          " AS LONG)").as("v"))
      .join(Tables.customer(s, dir)
        .select(col("c_custkey").as("ck"), col("c_nationkey").as("nk")),
        "ck")
      .join(broadcast(Tables.nation(s, dir)
        .select(col("n_nationkey").as("nk"), col("n_name").as("nat"))),
        "nk")
    base.groupBy(col("nat"))
      .agg(sum(col("hp")).as("n1"),
        sum(col("hp") * col("v")).as("s1"),
        sum(expr("hp * CAST(v AS DECIMAL(38,0)) * v")).as("q1"),
        sum(lit(1) - col("hp")).as("n0"),
        sum((lit(1) - col("hp")) * col("v")).as("s0"),
        sum(expr("(1 - hp) * CAST(v AS DECIMAL(38,0)) * v")).as("q0"))
      .where(col("n1") > 1 && col("n0") > 1)
      .select(col("nat"),
        expr("CAST(floor(1e6 * (CAST(s1 AS DOUBLE) / n1" +
          " - CAST(s0 AS DOUBLE) / n0) / 100) AS BIGINT)").as("d6"),
        expr("CAST(floor(1000000.0" +
          " * (CAST(n1 * q1 - CAST(s1 AS DECIMAL(38,0)) * s1" +
          " AS DOUBLE) / (CAST(n1 AS DOUBLE) * n1 * (n1 - 1))" +
          " + CAST(n0 * q0 - CAST(s0 AS DECIMAL(38,0)) * s0 AS DOUBLE)" +
          " / (CAST(n0 AS DOUBLE) * n0 * (n0 - 1)))" +
          " / 10000) AS BIGINT)").as("se26"))
  }

  /** Shared ×10¹⁵-scaled integer weight terms over st: with D =
    * d6/1e6 (dollars) and S = se26/1e6 (dollars²), tw ≈ 1e15/S,
    * twd ≈ 1e15·D/S, twd2 ≈ 1e15·D²/S — all floored BIGINTs. */
  private def twSql: String =
    "CAST(floor(1e15 / (CAST(se26 AS DOUBLE) / 1e6)) AS BIGINT)"
  private def twdSql: String =
    "CAST(floor(1e15 * (CAST(d6 AS DOUBLE) / 1e6) / (CAST(se26 AS DOUBLE) / 1e6))" +
      " AS BIGINT)"
  private def twd2Sql: String =
    "CAST(floor(1e15 * (CAST(d6 AS DOUBLE) / 1e6) * (CAST(d6 AS DOUBLE) / 1e6)" +
      " / (CAST(se26 AS DOUBLE) / 1e6)) AS BIGINT)"

  /** Fixed-effect inverse-variance pooled effect. */
  def q1081: Q = Q(
    "q1081_fixed_effect_pooled",
    Some(s"""
      |WITH ${sqlSt},
      |tm AS (SELECT $twSql AS tw, $twdSql AS twd FROM st),
      |ag AS (SELECT count(*) AS ns, sum(tw) AS sw, sum(twd) AS swd
      |       FROM tm)
      |SELECT CAST(ns AS BIGINT) AS n_studies,
      |       CAST(floor(CAST(swd AS DOUBLE) / CAST(sw AS DOUBLE))
      |            AS BIGINT) AS pooled_diff_dollars,
      |       CAST(floor(sqrt(1e15 / CAST(sw AS DOUBLE)))
      |            AS BIGINT) AS se_pooled_dollars
      |FROM ag
      |""".stripMargin)) { (s, dir) =>
    stFrame(s, dir)
      .select(expr(twSql).as("tw"), expr(twdSql).as("twd"))
      .agg(count(lit(1)).as("ns"), sum(col("tw")).as("sw"),
        sum(col("twd")).as("swd"))
      .select(col("ns").cast("long").as("n_studies"),
        expr("CAST(floor(CAST(swd AS DOUBLE) / CAST(sw AS DOUBLE))" +
          " AS BIGINT)").as("pooled_diff_dollars"),
        expr("CAST(floor(sqrt(1e15 / CAST(sw AS DOUBLE)))" +
          " AS BIGINT)").as("se_pooled_dollars"))
  }

  /** Cochran's Q and I² heterogeneity. */
  def q1082: Q = Q(
    "q1082_cochran_q",
    Some(s"""
      |WITH ${sqlSt},
      |tm AS (SELECT $twSql AS tw, $twdSql AS twd, $twd2Sql AS twd2
      |       FROM st),
      |ag AS (SELECT count(*) AS ns, sum(tw) AS sw, sum(twd) AS swd,
      |              sum(twd2) AS swd2
      |       FROM tm),
      |qq AS (SELECT ns,
      |              (CAST(swd2 AS DOUBLE) - CAST(swd AS DOUBLE)
      |                 * swd / CAST(sw AS DOUBLE)) / 1e15 AS q
      |       FROM ag)
      |SELECT CAST(ns AS BIGINT) AS n_studies,
      |       CAST(ns - 1 AS BIGINT) AS df,
      |       CAST(floor(1000.0 * q) AS BIGINT) AS q_milli,
      |       CAST(floor(1000.0 * greatest(0,
      |            (q - (ns - 1)) / q)) AS BIGINT) AS i2_milli
      |FROM qq
      |""".stripMargin)) { (s, dir) =>
    stFrame(s, dir)
      .select(expr(twSql).as("tw"), expr(twdSql).as("twd"),
        expr(twd2Sql).as("twd2"))
      .agg(count(lit(1)).as("ns"), sum(col("tw")).as("sw"),
        sum(col("twd")).as("swd"), sum(col("twd2")).as("swd2"))
      .select(col("ns"),
        expr("(CAST(swd2 AS DOUBLE) - CAST(swd AS DOUBLE)" +
          " * swd / CAST(sw AS DOUBLE)) / 1e15").as("q"))
      .select(col("ns").cast("long").as("n_studies"),
        (col("ns") - 1).cast("long").as("df"),
        expr("CAST(floor(1000.0 * q) AS BIGINT)").as("q_milli"),
        expr("CAST(floor(1000.0 * greatest(0," +
          " (q - (ns - 1)) / q)) AS BIGINT)").as("i2_milli"))
  }

  /** Leave-one-study-out sensitivity of the pooled effect. */
  def q1083: Q = Q(
    "q1083_leave_one_out",
    Some(s"""
      |WITH ${sqlSt},
      |tm AS (SELECT nat, $twSql AS tw, $twdSql AS twd FROM st),
      |ag AS (SELECT sum(tw) AS sw, sum(twd) AS swd FROM tm)
      |SELECT nat AS nation,
      |       CAST(floor((CAST(swd AS DOUBLE) - twd)
      |            / (CAST(sw AS DOUBLE) - tw)) AS BIGINT)
      |         AS loo_pooled_dollars,
      |       CAST(floor(1000.0 * ((CAST(swd AS DOUBLE) - twd)
      |              / (CAST(sw AS DOUBLE) - tw)
      |            - CAST(swd AS DOUBLE) / CAST(sw AS DOUBLE)))
      |            AS BIGINT) AS shift_milli
      |FROM tm CROSS JOIN ag ORDER BY nation
      |""".stripMargin)) { (s, dir) =>
    val tm = stFrame(s, dir)
      .select(col("nat"), expr(twSql).as("tw"), expr(twdSql).as("twd"))
    val ag = tm.agg(sum(col("tw")).as("sw"), sum(col("twd")).as("swd"))
    tm.crossJoin(broadcast(ag))
      .select(col("nat").as("nation"),
        expr("CAST(floor((CAST(swd AS DOUBLE) - twd)" +
          " / (CAST(sw AS DOUBLE) - tw)) AS BIGINT)")
          .as("loo_pooled_dollars"),
        expr("CAST(floor(1000.0 * ((CAST(swd AS DOUBLE) - twd)" +
          " / (CAST(sw AS DOUBLE) - tw)" +
          " - CAST(swd AS DOUBLE) / CAST(sw AS DOUBLE))) AS BIGINT)")
          .as("shift_milli"))
      .orderBy(col("nation"))
  }

  /** Egger funnel-asymmetry regression: standardized effect z on a
    * ×10¹²-scaled precision; a nonzero intercept flags small-study
    * bias. All four per-study terms are floored integers. */
  def q1084: Q = Q(
    "q1084_egger_regression",
    Some(s"""
      |WITH ${sqlSt},
      |tm AS (SELECT
      |    CAST(floor(1e6 * (CAST(d6 AS DOUBLE) / 1e6)
      |         / sqrt(CAST(se26 AS DOUBLE) / 1e6)) AS BIGINT) AS z6,
      |    CAST(floor(1e12
      |         / sqrt(CAST(se26 AS DOUBLE) / 1e6)) AS BIGINT) AS p6,
      |    CAST(floor(1e12 * (CAST(d6 AS DOUBLE) / 1e6)
      |         / (CAST(se26 AS DOUBLE) / 1e6)) AS BIGINT) AS zp6,
      |    CAST(floor(1e24 / (CAST(se26 AS DOUBLE) / 1e6)) AS BIGINT) AS pp6
      |  FROM st),
      |ag AS (SELECT count(*) AS ns, sum(z6) AS sz, sum(p6) AS sp,
      |              sum(zp6) AS szp, sum(pp6) AS sp2
      |       FROM tm),
      |ols AS (SELECT ns, sz, sp,
      |  (1e6 * ns * CAST(szp AS DOUBLE)
      |     - CAST(sz AS DOUBLE) * sp)
      |    / (1e6 * (ns * CAST(sp2 AS DOUBLE)
      |       - CAST(sp AS DOUBLE) * sp)) AS b
      |  FROM ag)
      |SELECT CAST(ns AS BIGINT) AS n_studies,
      |       CAST(floor(1000.0 * (CAST(sz AS DOUBLE) / 1e6
      |            - b * CAST(sp AS DOUBLE)) / ns) AS BIGINT)
      |         AS intercept_milli,
      |       CAST(floor(1e15 * b) AS BIGINT) AS slope_nano
      |FROM ols
      |""".stripMargin)) { (s, dir) =>
    val tm = stFrame(s, dir).select(
      expr("CAST(floor(1e6 * (CAST(d6 AS DOUBLE) / 1e6)" +
        " / sqrt(CAST(se26 AS DOUBLE) / 1e6)) AS BIGINT)").as("z6"),
      expr("CAST(floor(1e12" +
        " / sqrt(CAST(se26 AS DOUBLE) / 1e6)) AS BIGINT)").as("p6"),
      expr("CAST(floor(1e12 * (CAST(d6 AS DOUBLE) / 1e6)" +
        " / (CAST(se26 AS DOUBLE) / 1e6)) AS BIGINT)").as("zp6"),
      expr("CAST(floor(1e24 / (CAST(se26 AS DOUBLE) / 1e6)) AS BIGINT)")
        .as("pp6"))
    val ag = tm.agg(count(lit(1)).as("ns"), sum(col("z6")).as("sz"),
      sum(col("p6")).as("sp"), sum(col("zp6")).as("szp"),
      sum(col("pp6")).as("sp2"))
    ag.select(col("ns"), col("sz"), col("sp"),
        expr("(1e6 * ns * CAST(szp AS DOUBLE)" +
          " - CAST(sz AS DOUBLE) * sp)" +
          " / (1e6 * (ns * CAST(sp2 AS DOUBLE)" +
          " - CAST(sp AS DOUBLE) * sp))").as("b"))
      .select(col("ns").cast("long").as("n_studies"),
        expr("CAST(floor(1000.0 * (CAST(sz AS DOUBLE) / 1e6" +
          " - b * CAST(sp AS DOUBLE)) / ns) AS BIGINT)")
          .as("intercept_milli"),
        expr("CAST(floor(1e15 * b) AS BIGINT)").as("slope_nano"))
  }

  /** DerSimonian–Laird random effects: τ and the re-pooled effect
    * (tw2 ≈ 1e30/S² stays a floored integer). */
  def q1085: Q = Q(
    "q1085_dersimonian_laird",
    Some(s"""
      |WITH ${sqlSt},
      |tm AS (SELECT d6, se26, $twSql AS tw, $twdSql AS twd,
      |              $twd2Sql AS twd2,
      |              CAST(floor(1e30 / ((CAST(se26 AS DOUBLE) / 1e6)
      |                   * (CAST(se26 AS DOUBLE) / 1e6))) AS BIGINT) AS tw2
      |       FROM st),
      |ag AS (SELECT count(*) AS ns, sum(tw) AS sw, sum(twd) AS swd,
      |              sum(twd2) AS swd2, sum(tw2) AS sw2
      |       FROM tm),
      |tau AS (SELECT ns,
      |  greatest(0, ((CAST(swd2 AS DOUBLE) - CAST(swd AS DOUBLE)
      |      * swd / CAST(sw AS DOUBLE)) / 1e15 - (ns - 1))
      |    / ((CAST(sw AS DOUBLE)
      |        - CAST(sw2 AS DOUBLE) / CAST(sw AS DOUBLE)) / 1e15))
      |    AS tau2
      |  FROM ag),
      |re AS (SELECT tau.tau2, tau.ns,
      |              sum(CAST(floor(1e15 / (CAST(se26 AS DOUBLE) / 1e6
      |                   + tau.tau2)) AS BIGINT)) AS swr,
      |              sum(CAST(floor(1e15 * (CAST(d6 AS DOUBLE) / 1e6)
      |                   / (CAST(se26 AS DOUBLE) / 1e6 + tau.tau2)) AS BIGINT))
      |                AS swrd
      |       FROM tm CROSS JOIN tau GROUP BY 1, 2)
      |SELECT CAST(ns AS BIGINT) AS n_studies,
      |       CAST(floor(sqrt(tau2)) AS BIGINT) AS tau_dollars,
      |       CAST(floor(CAST(swrd AS DOUBLE)
      |            / CAST(swr AS DOUBLE)) AS BIGINT)
      |         AS pooled_re_dollars
      |FROM re
      |""".stripMargin)) { (s, dir) =>
    val tm = stFrame(s, dir)
      .select(col("d6"), col("se26"), expr(twSql).as("tw"),
        expr(twdSql).as("twd"), expr(twd2Sql).as("twd2"),
        expr("CAST(floor(1e30 / ((CAST(se26 AS DOUBLE) / 1e6)" +
          " * (CAST(se26 AS DOUBLE) / 1e6))) AS BIGINT)").as("tw2"))
      .materialize()
    val ag = tm.agg(count(lit(1)).as("ns"), sum(col("tw")).as("sw"),
      sum(col("twd")).as("swd"), sum(col("twd2")).as("swd2"),
      sum(col("tw2")).as("sw2"))
    val tau = ag.select(col("ns"),
      expr("greatest(0, ((CAST(swd2 AS DOUBLE) - CAST(swd AS DOUBLE)" +
        " * swd / CAST(sw AS DOUBLE)) / 1e15 - (ns - 1))" +
        " / ((CAST(sw AS DOUBLE)" +
        " - CAST(sw2 AS DOUBLE) / CAST(sw AS DOUBLE)) / 1e15))")
        .as("tau2"))
    tm.crossJoin(broadcast(tau))
      .groupBy(col("tau2"), col("ns"))
      .agg(sum(expr("CAST(floor(1e15 / (CAST(se26 AS DOUBLE) / 1e6 + tau2))" +
        " AS BIGINT)")).as("swr"),
        sum(expr("CAST(floor(1e15 * (CAST(d6 AS DOUBLE) / 1e6)" +
          " / (CAST(se26 AS DOUBLE) / 1e6 + tau2)) AS BIGINT)")).as("swrd"))
      .select(col("ns").cast("long").as("n_studies"),
        expr("CAST(floor(sqrt(tau2)) AS BIGINT)").as("tau_dollars"),
        expr("CAST(floor(CAST(swrd AS DOUBLE)" +
          " / CAST(swr AS DOUBLE)) AS BIGINT)")
          .as("pooled_re_dollars"))
  }
}
