package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables
import graft.dedup.SortedNeighborhood

/** Round-9 extreme-value completion wave on the order-value upper
  * tail, extending the shipped Hill estimator (q677 on document
  * lengths) with the rest of the tail-index toolbox: the Pickands
  * three-quantile estimator, the Dekkers-Einmahl-de Haan moment
  * estimator (valid for ALL ξ, unlike Hill), the GPD mean-excess
  * slope diagnostic, Weissman return levels, and a Hill horizon-
  * stability audit (k vs 2k).
  *
  * Scale: the value-descending rank rides the bucket-parallel
  * [[SortedNeighborhood.globalRankCum]] spine (bucket = −(v div 10⁶));
  * the top-k tail frames are rank-filtered facts (≤10%), the
  * threshold dims are ≤4-row broadcasts. ln terms use the established
  * DECIMAL(18,9) quantization before exact decimal sums; order
  * statistics are exact integers; each estimator is one pinned
  * double. */
object ExtremeTailQueries {

  val all: Seq[Q] = Seq(q836, q837, q838, q839, q840)

  private def sqlRk: String = """
    |x AS (SELECT o_orderkey AS k,
    |             CAST(o_totalprice * 100 AS BIGINT) AS v FROM orders),
    |rk AS (SELECT v, row_number() OVER (ORDER BY v DESC, k) AS i
    |       FROM x),
    |gl AS (SELECT count(*) AS n FROM x)""".stripMargin

  /** Spark value-descending rank spine (v, __rank) + count. */
  private def rkBase(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val x = Tables.orders(s, dir)
      .select(col("o_orderkey").as("k"),
        expr("CAST(CAST(o_totalprice * 100 AS DECIMAL(38,0)) AS LONG)")
          .as("v"))
      .withColumn("nvb", expr("-(v div 1000000)"))
      .withColumn("nv", -col("v"))
    val rk = SortedNeighborhood.globalRankCum(x, "k", "nvb", Seq("nv"))
      .select(col("v"), col("__rank").as("i"))
    val gl = x.agg(count(lit(1)).as("n"))
    (rk, gl)
  }

  /** Pickands estimator at k = n/40: ξ̂ = ln((X₍k₎−X₍2k₎)/(X₍2k₎−X₍4k₎))/ln 2. */
  def q836: Q = Q(
    "q836_pickands_estimator",
    Some(s"""
      |WITH ${sqlRk},
      |kk AS (SELECT n // 40 AS k FROM gl),
      |os AS (SELECT
      |  (SELECT k FROM kk) AS k,
      |  (SELECT v FROM rk JOIN kk ON rk.i = kk.k) AS xk,
      |  (SELECT v FROM rk JOIN kk ON rk.i = 2 * kk.k) AS x2k,
      |  (SELECT v FROM rk JOIN kk ON rk.i = 4 * kk.k) AS x4k)
      |SELECT CAST(k AS BIGINT) AS k,
      |       CAST(xk AS BIGINT) AS xk_cents,
      |       CAST(x2k AS BIGINT) AS x2k_cents,
      |       CAST(x4k AS BIGINT) AS x4k_cents,
      |       CAST(floor(1000.0 * ln(CAST(xk - x2k AS DOUBLE)
      |            / (x2k - x4k)) / ln(2.0)) AS BIGINT)
      |         AS pickands_xi_milli
      |FROM os
      |""".stripMargin)) { (s, dir) =>
    val (rk, gl) = rkBase(s, dir)
    val kk = broadcast(gl.select(expr("n div 40").as("k")))
    val rkK = rk.crossJoin(kk)
    def at(m: Int, nm: String): DataFrame =
      rkK.where(col("i") === col("k") * m).select(col("v").as(nm))
    kk.crossJoin(broadcast(at(1, "xk")))
      .crossJoin(broadcast(at(2, "x2k")))
      .crossJoin(broadcast(at(4, "x4k")))
      .select(col("k").cast("long").as("k"),
        col("xk").cast("long").as("xk_cents"),
        col("x2k").cast("long").as("x2k_cents"),
        col("x4k").cast("long").as("x4k_cents"),
        expr("""CAST(floor(1000.0 * ln(CAST(xk - x2k AS DOUBLE)
          |  / (x2k - x4k)) / ln(2.0)) AS BIGINT)""".stripMargin)
          .as("pickands_xi_milli"))
  }

  /** Dekkers-Einmahl-de Haan moment estimator at k = n/20, with the
    * Hill first moment as a side column. */
  def q837: Q = Q(
    "q837_dekkers_moment",
    Some(s"""
      |WITH ${sqlRk},
      |kk AS (SELECT n // 20 AS k FROM gl),
      |xk AS (SELECT v AS vk FROM rk JOIN kk ON rk.i = kk.k),
      |lt AS (SELECT CAST(ln(CAST(rk.v AS DOUBLE) / xk.vk)
      |              AS DECIMAL(18,9)) AS l
      |       FROM rk CROSS JOIN xk JOIN kk ON rk.i < kk.k),
      |mm AS (SELECT count(*) AS m, sum(l) AS s1, sum(l * l) AS s2
      |       FROM lt)
      |SELECT CAST(m AS BIGINT) AS k_used,
      |       CAST(floor(1000.0 * (CAST(s1 AS DOUBLE) / m + 1.0
      |            - 0.5 / (1.0 - (CAST(s1 AS DOUBLE) / m)
      |                     * (CAST(s1 AS DOUBLE) / m)
      |                     / (CAST(s2 AS DOUBLE) / m)))) AS BIGINT)
      |         AS dekkers_xi_milli,
      |       CAST(floor(1000.0 * CAST(s1 AS DOUBLE) / m) AS BIGINT)
      |         AS hill_milli
      |FROM mm
      |""".stripMargin)) { (s, dir) =>
    val (rk, gl) = rkBase(s, dir)
    val kk = broadcast(gl.select(expr("n div 20").as("k")))
    val xk = rk.crossJoin(kk).where(col("i") === col("k"))
      .select(col("v").as("vk"))
    rk.crossJoin(kk).where(col("i") < col("k"))
      .crossJoin(broadcast(xk))
      .select(expr("CAST(ln(CAST(v AS DOUBLE) / vk) AS DECIMAL(18,9))")
        .as("l"))
      .agg(count(lit(1)).as("m"), sum(col("l")).as("s1"),
        sum(col("l") * col("l")).as("s2"))
      .select(col("m").cast("long").as("k_used"),
        expr("""CAST(floor(1000.0 * (CAST(s1 AS DOUBLE) / m + 1.0
          |  - 0.5 / (1.0 - (CAST(s1 AS DOUBLE) / m)
          |           * (CAST(s1 AS DOUBLE) / m)
          |           / (CAST(s2 AS DOUBLE) / m)))) AS BIGINT)"""
          .stripMargin).as("dekkers_xi_milli"),
        expr("CAST(floor(1000.0 * CAST(s1 AS DOUBLE) / m) AS BIGINT)")
          .as("hill_milli"))
  }

  /** GPD mean-excess diagnostic: e(u) at the 90/92.5/95/97.5%
    * thresholds and the OLS slope → implied ξ = slope/(1+slope). */
  def q838: Q = Q(
    "q838_mean_excess_slope",
    Some(s"""
      |WITH ${sqlRk},
      |vcum AS (SELECT v AS val, sum(c) OVER (ORDER BY v) AS cum FROM
      |  (SELECT v, count(*) AS c FROM x GROUP BY 1)),
      |pp AS (SELECT * FROM (VALUES (900),(925),(950),(975)) AS t(p)),
      |qq AS (SELECT pp.p, min(val) AS u FROM pp CROSS JOIN gl
      |       JOIN vcum ON 1000 * vcum.cum >= pp.p * gl.n GROUP BY 1),
      |me AS (
      |  SELECT qq.p, qq.u, count(*) AS nu,
      |         sum(CAST(x.v - qq.u AS HUGEINT)) // count(*) AS e
      |  FROM qq JOIN x ON x.v > qq.u GROUP BY 1, 2),
      |mo AS (SELECT count(*) AS np, sum(CAST(u AS HUGEINT)) AS sx,
      |              sum(e) AS sy, sum(CAST(u AS HUGEINT) * e) AS sxy,
      |              sum(CAST(u AS HUGEINT) * u) AS sxx FROM me)
      |SELECT CAST(np AS BIGINT) AS n_thresholds,
      |       CAST(floor(1000.0 * CAST(np * sxy - sx * sy AS DOUBLE)
      |            / CAST(np * sxx - sx * sx AS DOUBLE)) AS BIGINT)
      |         AS me_slope_milli,
      |       CAST(floor(1000.0
      |         * (CAST(np * sxy - sx * sy AS DOUBLE)
      |            / CAST(np * sxx - sx * sx AS DOUBLE))
      |         / (1.0 + CAST(np * sxy - sx * sy AS DOUBLE)
      |            / CAST(np * sxx - sx * sx AS DOUBLE))) AS BIGINT)
      |         AS implied_xi_milli
      |FROM mo
      |""".stripMargin)) { (s, dir) =>
    val x = Tables.orders(s, dir)
      .select(col("o_orderkey").as("k"),
        expr("CAST(CAST(o_totalprice * 100 AS DECIMAL(38,0)) AS LONG)")
          .as("v")).materialize()
    val gl = x.agg(count(lit(1)).as("n"))
    val vc = x.groupBy(col("v").as("val")).agg(count(lit(1)).as("c"))
      .withColumn("vb", expr("val div 1000000"))
    val vcum = SortedNeighborhood.globalRankCum(vc, "val", "vb", Seq.empty,
      cumCol = Some("c"))
    val pp = x.sparkSession.createDataFrame(
      Seq(900, 925, 950, 975).map(Tuple1(_))).toDF("p")
    val qq = broadcast(pp).crossJoin(broadcast(gl))
      .join(vcum, col("__cum") * 1000 >= col("p") * col("n"))
      .groupBy(col("p")).agg(min(col("val")).as("u"))
    val me = x.join(broadcast(qq), col("v") > col("u"))
      .groupBy(col("p"), col("u"))
      .agg(count(lit(1)).as("nu"),
        sum((col("v") - col("u")).cast("decimal(38,0)")).as("se"))
      .select(col("u").cast("decimal(38,0)").as("u"),
        expr("CAST((se - se % nu) / nu AS DECIMAL(38,0))").as("e"))
    me.agg(count(lit(1)).as("np"), sum(col("u")).as("sx"),
        sum(col("e")).as("sy"), sum(col("u") * col("e")).as("sxy"),
        sum(col("u") * col("u")).as("sxx"))
      .select(col("np").cast("long").as("n_thresholds"),
        expr("""CAST(floor(1000.0 * CAST(np * sxy - sx * sy AS DOUBLE)
          |  / CAST(np * sxx - sx * sx AS DOUBLE)) AS BIGINT)"""
          .stripMargin).as("me_slope_milli"),
        expr("""CAST(floor(1000.0
          |  * (CAST(np * sxy - sx * sy AS DOUBLE)
          |     / CAST(np * sxx - sx * sx AS DOUBLE))
          |  / (1.0 + CAST(np * sxy - sx * sy AS DOUBLE)
          |     / CAST(np * sxx - sx * sx AS DOUBLE))) AS BIGINT)"""
          .stripMargin).as("implied_xi_milli"))
  }

  /** Weissman return levels from the Hill fit at k = n/20:
    * x_p = X₍k₎·(k/(n·p))^ξ̂ for p = 10⁻³ and 10⁻⁴. */
  def q839: Q = Q(
    "q839_return_levels",
    Some(s"""
      |WITH ${sqlRk},
      |kk AS (SELECT n // 20 AS k, n FROM gl),
      |xk AS (SELECT v AS vk FROM rk JOIN kk ON rk.i = kk.k),
      |lt AS (SELECT CAST(ln(CAST(rk.v AS DOUBLE) / xk.vk)
      |              AS DECIMAL(18,9)) AS l
      |       FROM rk CROSS JOIN xk JOIN kk ON rk.i < kk.k),
      |hh AS (SELECT CAST(sum(l) AS DOUBLE) / count(*) AS h FROM lt)
      |SELECT CAST(kk.k AS BIGINT) AS k,
      |       CAST(xk.vk AS BIGINT) AS xk_cents,
      |       CAST(floor(xk.vk * pow(CAST(kk.k AS DOUBLE)
      |            / (kk.n * 0.001), hh.h)) AS BIGINT) AS rl_1e3_cents,
      |       CAST(floor(xk.vk * pow(CAST(kk.k AS DOUBLE)
      |            / (kk.n * 0.0001), hh.h)) AS BIGINT) AS rl_1e4_cents
      |FROM kk CROSS JOIN xk CROSS JOIN hh
      |""".stripMargin)) { (s, dir) =>
    val (rk, gl) = rkBase(s, dir)
    val kk = broadcast(gl.select(expr("n div 20").as("k"), col("n")))
    val xk = rk.crossJoin(kk).where(col("i") === col("k"))
      .select(col("v").as("vk"))
    val hh = rk.crossJoin(kk).where(col("i") < col("k"))
      .crossJoin(broadcast(xk))
      .select(expr("CAST(ln(CAST(v AS DOUBLE) / vk) AS DECIMAL(18,9))")
        .as("l"))
      .agg(expr("CAST(sum(l) AS DOUBLE) / count(*)").as("h"))
    kk.crossJoin(broadcast(xk)).crossJoin(broadcast(hh))
      .select(col("k").cast("long").as("k"),
        col("vk").cast("long").as("xk_cents"),
        expr("""CAST(floor(vk * pow(CAST(k AS DOUBLE) / (n * 0.001), h))
          |  AS BIGINT)""".stripMargin).as("rl_1e3_cents"),
        expr("""CAST(floor(vk * pow(CAST(k AS DOUBLE) / (n * 0.0001), h))
          |  AS BIGINT)""".stripMargin).as("rl_1e4_cents"))
  }

  /** Hill horizon stability: the estimator at k = n/20 vs k = n/10 —
    * a large drift flags a non-converged tail fit. */
  def q840: Q = Q(
    "q840_hill_stability",
    Some(s"""
      |WITH ${sqlRk},
      |kk AS (SELECT n // 20 AS k1, n // 10 AS k2 FROM gl),
      |x1 AS (SELECT v AS v1 FROM rk JOIN kk ON rk.i = kk.k1),
      |x2 AS (SELECT v AS v2 FROM rk JOIN kk ON rk.i = kk.k2),
      |h1 AS (SELECT count(*) AS m1,
      |              sum(CAST(ln(CAST(rk.v AS DOUBLE) / x1.v1)
      |                  AS DECIMAL(18,9))) AS s1
      |       FROM rk CROSS JOIN x1 JOIN kk ON rk.i < kk.k1),
      |h2 AS (SELECT count(*) AS m2,
      |              sum(CAST(ln(CAST(rk.v AS DOUBLE) / x2.v2)
      |                  AS DECIMAL(18,9))) AS s2
      |       FROM rk CROSS JOIN x2 JOIN kk ON rk.i < kk.k2)
      |SELECT CAST(m1 AS BIGINT) AS k_narrow,
      |       CAST(m2 AS BIGINT) AS k_wide,
      |       CAST(floor(1000000.0 * CAST(s1 AS DOUBLE) / m1) AS BIGINT)
      |         AS hill_narrow_micro,
      |       CAST(floor(1000000.0 * CAST(s2 AS DOUBLE) / m2) AS BIGINT)
      |         AS hill_wide_micro,
      |       CAST(floor(1000000.0 * (CAST(s2 AS DOUBLE) / m2
      |            - CAST(s1 AS DOUBLE) / m1)) AS BIGINT)
      |         AS drift_micro
      |FROM h1 CROSS JOIN h2
      |""".stripMargin)) { (s, dir) =>
    val (rk0, gl) = rkBase(s, dir)
    val rk = rk0.materialize()
    val kk = broadcast(gl.select(expr("n div 20").as("k1"),
      expr("n div 10").as("k2")))
    def hillAt(kcol: String, vnm: String): DataFrame = {
      val xv = rk.crossJoin(kk).where(col("i") === col(kcol))
        .select(col("v").as(vnm))
      rk.crossJoin(kk).where(col("i") < col(kcol))
        .crossJoin(broadcast(xv))
        .select(expr(s"CAST(ln(CAST(v AS DOUBLE) / $vnm)" +
          " AS DECIMAL(18,9))").as("l"))
        .agg(count(lit(1)).as(s"m_$vnm"), sum(col("l")).as(s"s_$vnm"))
    }
    hillAt("k1", "v1").crossJoin(broadcast(hillAt("k2", "v2")))
      .select(col("m_v1").cast("long").as("k_narrow"),
        col("m_v2").cast("long").as("k_wide"),
        expr("CAST(floor(1000000.0 * CAST(s_v1 AS DOUBLE) / m_v1)" +
          " AS BIGINT)").as("hill_narrow_micro"),
        expr("CAST(floor(1000000.0 * CAST(s_v2 AS DOUBLE) / m_v2)" +
          " AS BIGINT)").as("hill_wide_micro"),
        expr("""CAST(floor(1000000.0 * (CAST(s_v2 AS DOUBLE) / m_v2
          |  - CAST(s_v1 AS DOUBLE) / m_v1)) AS BIGINT)""".stripMargin)
          .as("drift_micro"))
  }
}
