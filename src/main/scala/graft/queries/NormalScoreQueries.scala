package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Materialize.MatOps
import graft.Tables

/** Round-10 normal-scores wave: the van der Waerden two-sample
  * location test, the normal-scores (van der Waerden) correlation,
  * a Shapiro–Francia-style Q-Q linearity audit of the daily revenue,
  * and rankit z-score outliers — all built on a PORTABLE inverse
  * normal CDF: Acklam's piecewise-rational approximation emitted as
  * ONE shared SQL text (pure double +,·,/,sqrt,ln — deterministic and
  * identical in both engines, so the function is a DEFINITION, not an
  * approximation risk: the oracle replays the same expression).
  *
  * Exactness: probabilities enter as exact rationals from midranks
  * (p = mr2/(2(N+1)) — never 0 or 1 by construction); Φ⁻¹ evaluates
  * only on bounded dims (≤50-value histograms, the day dim); the test
  * statistics standardize exact-weighted score sums through the same
  * finite-population variance used by the two-sample wave.
  *
  * Scale: one fact scan per face to a bounded histogram/day dim; the
  * scores never touch a fact-scaled frame. */
object NormalScoreQueries {

  val all: Seq[Q] = Seq(q1041, q1042, q1043, q1044, q1045)

  /** Acklam inverse-normal-CDF over the SQL expression `p` (a DOUBLE
    * strictly inside (0,1)) — shared text for both engines. */
  private def invNorm(p: String): String = {
    val lo =
      s"""(((((-7.784894002430293e-03 * sqrt(-2.0 * ln($p))
         |  - 3.223964580411365e-01) * sqrt(-2.0 * ln($p))
         |  - 2.400758277161838e+00) * sqrt(-2.0 * ln($p))
         |  - 2.549732539343734e+00) * sqrt(-2.0 * ln($p))
         |  + 4.374664141464968e+00) * sqrt(-2.0 * ln($p))
         |  + 2.938163982698783e+00)
         | / ((((7.784695709041462e-03 * sqrt(-2.0 * ln($p))
         |  + 3.224671290700398e-01) * sqrt(-2.0 * ln($p))
         |  + 2.445134137142996e+00) * sqrt(-2.0 * ln($p))
         |  + 3.754408661907416e+00) * sqrt(-2.0 * ln($p)) + 1.0)"""
        .stripMargin.replace("\n", " ")
    val hi =
      s"""-((((((-7.784894002430293e-03 * sqrt(-2.0 * ln(1.0 - $p))
         |  - 3.223964580411365e-01) * sqrt(-2.0 * ln(1.0 - $p))
         |  - 2.400758277161838e+00) * sqrt(-2.0 * ln(1.0 - $p))
         |  - 2.549732539343734e+00) * sqrt(-2.0 * ln(1.0 - $p))
         |  + 4.374664141464968e+00) * sqrt(-2.0 * ln(1.0 - $p))
         |  + 2.938163982698783e+00)
         | / ((((7.784695709041462e-03 * sqrt(-2.0 * ln(1.0 - $p))
         |  + 3.224671290700398e-01) * sqrt(-2.0 * ln(1.0 - $p))
         |  + 2.445134137142996e+00) * sqrt(-2.0 * ln(1.0 - $p))
         |  + 3.754408661907416e+00) * sqrt(-2.0 * ln(1.0 - $p)) + 1.0))"""
        .stripMargin.replace("\n", " ")
    val mid =
      s"""((((((-3.969683028665376e+01 * (($p - 0.5) * ($p - 0.5))
         |  + 2.209460984245205e+02) * (($p - 0.5) * ($p - 0.5))
         |  - 2.759285104469687e+02) * (($p - 0.5) * ($p - 0.5))
         |  + 1.383577518672690e+02) * (($p - 0.5) * ($p - 0.5))
         |  - 3.066479806614716e+01) * (($p - 0.5) * ($p - 0.5))
         |  + 2.506628277459239e+00) * ($p - 0.5))
         | / (((((-5.447609879822406e+01 * (($p - 0.5) * ($p - 0.5))
         |  + 1.615858368580409e+02) * (($p - 0.5) * ($p - 0.5))
         |  - 1.556989798598866e+02) * (($p - 0.5) * ($p - 0.5))
         |  + 6.680131188771972e+01) * (($p - 0.5) * ($p - 0.5))
         |  - 1.328068155288572e+01) * (($p - 0.5) * ($p - 0.5)) + 1.0)"""
        .stripMargin.replace("\n", " ")
    s"(CASE WHEN $p < 0.02425 THEN $lo WHEN $p > 0.97575 THEN $hi" +
      s" ELSE $mid END)"
  }

  /** Quantity histogram + midrank probabilities (the two-sample
    * spine): h(v, cx, cy), mr adds mr2 and the exact-rational
    * p = mr2/(2(N+1)) as DOUBLE, plus the normal score ns. */
  private def sqlNs: String = s"""
    |h AS (
    |  SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS v,
    |         sum(CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END) AS cx,
    |         sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS cy
    |  FROM lineitem GROUP BY 1),
    |mo AS (SELECT sum(cx) AS nx, sum(cy) AS ny, sum(cx + cy) AS n
    |       FROM h),
    |mr AS (
    |  SELECT v, cx, cy,
    |         2 * coalesce(sum(cx + cy) OVER (ORDER BY v
    |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
    |           + (cx + cy) + 1 AS mr2
    |  FROM h),
    |ns AS (
    |  SELECT mr.v, mr.cx, mr.cy,
    |         ${invNorm("(CAST(mr.mr2 AS DOUBLE) / (2.0 * (mo.n + 1)))")}
    |           AS sc
    |  FROM mr CROSS JOIN mo)""".stripMargin

  /** Spark twin of the ns frame plus the 1-row mo scalars. */
  private def nsBase(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val h = Tables.lineitem(s, dir)
      .groupBy(expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").as("v"))
      .agg(sum(when(col("l_returnflag") === "R", 0L).otherwise(1L))
        .as("cx"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
          .as("cy"))
      .materialize() // ≤50-value histogram
    val mo = h.agg(sum(col("cx")).as("nx"), sum(col("cy")).as("ny"),
      sum(col("cx") + col("cy")).as("n"))
    val wb = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ns = h.select(col("v"), col("cx"), col("cy"),
        (lit(2L) * coalesce(sum(col("cx") + col("cy")).over(wb), lit(0L))
          + (col("cx") + col("cy")) + 1).as("mr2"))
      .crossJoin(broadcast(mo))
      .select(col("v"), col("cx"), col("cy"),
        expr(invNorm("(CAST(mr2 AS DOUBLE) / (2.0 * (n + 1)))"))
          .as("sc"))
    (ns, mo)
  }

  /** Van der Waerden two-sample location test: T = Σ_y score, z² from
    * the finite-population score variance (scores as micro-quantized
    * decimals so the moment sums stay exact). */
  def q1041: Q = Q(
    "q1041_van_der_waerden",
    Some(s"""
      |WITH ${sqlNs},
      |qs AS (
      |  SELECT v, cx, cy,
      |         CAST(floor(1000000.0 * sc) AS BIGINT) AS s6
      |  FROM ns),
      |ag AS (
      |  SELECT sum(CAST(cy AS HUGEINT) * s6) AS ty,
      |         sum(CAST(cx + cy AS HUGEINT) * s6) AS tt,
      |         sum(CAST(cx + cy AS HUGEINT) * s6 * s6) AS tm
      |  FROM qs),
      |fin AS (SELECT ag.*, mo.nx, mo.ny, mo.n FROM ag CROSS JOIN mo)
      |SELECT CAST(ty AS BIGINT) AS score_sum_y_micro,
      |       CAST(floor(1000.0
      |            * (CAST(n * ty - ny * tt AS DOUBLE)
      |               * CAST(n * ty - ny * tt AS DOUBLE)
      |               * CAST(n - 1 AS DOUBLE))
      |            / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE)
      |               * CAST(n * tm - CAST(tt AS DOUBLE) * tt AS DOUBLE)))
      |            AS BIGINT) AS vdw_z2_milli
      |FROM fin
      |""".stripMargin)) { (s, dir) =>
    val (ns, mo) = nsBase(s, dir)
    val qs = ns.select(col("v"), col("cx"), col("cy"),
      expr("CAST(floor(1000000.0 * sc) AS BIGINT)").as("s6"))
    qs.agg(sum(col("cy").cast("decimal(38,0)") * col("s6")).as("ty"),
        sum((col("cx") + col("cy")).cast("decimal(38,0)") * col("s6"))
          .as("tt"),
        sum((col("cx") + col("cy")).cast("decimal(38,0)") * col("s6")
          * col("s6")).as("tm"))
      .crossJoin(broadcast(mo))
      .select(col("ty").cast("long").as("score_sum_y_micro"),
        expr("""CAST(floor(1000.0
          | * (CAST(n * ty - ny * tt AS DOUBLE)
          |    * CAST(n * ty - ny * tt AS DOUBLE)
          |    * CAST(n - 1 AS DOUBLE))
          | / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE)
          |    * CAST(n * tm - CAST(tt AS DOUBLE) * tt AS DOUBLE)))
          | AS BIGINT)""".stripMargin.replace("\n", " "))
          .as("vdw_z2_milli"))
  }

  /** Normal-scores (van der Waerden) correlation between line
    * quantity and discount: Φ⁻¹ of the midrank probabilities of each
    * margin on the bounded (quantity × discount-permille) histogram,
    * then Pearson of the micro-quantized scores. */
  def q1042: Q = Q(
    "q1042_normal_scores_corr",
    Some(s"""
      |WITH g AS (
      |  SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS qv,
      |         CAST(floor(l_discount * 1000 + 0.5) AS BIGINT) AS dv,
      |         count(*) AS c
      |  FROM lineitem GROUP BY 1, 2),
      |mo AS (SELECT sum(c) AS n FROM g),
      |qm AS (
      |  SELECT qv, 2 * coalesce(sum(c) OVER (ORDER BY qv
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |           + c + 1 AS mr2
      |  FROM (SELECT qv, sum(c) AS c FROM g GROUP BY 1)),
      |dm AS (
      |  SELECT dv, 2 * coalesce(sum(c) OVER (ORDER BY dv
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |           + c + 1 AS mr2
      |  FROM (SELECT dv, sum(c) AS c FROM g GROUP BY 1)),
      |sc AS (
      |  SELECT g.c,
      |         CAST(floor(1000000.0 * ${invNorm(
                 "(CAST(qm.mr2 AS DOUBLE) / (2.0 * (mo.n + 1)))")})
      |           AS BIGINT) AS sx,
      |         CAST(floor(1000000.0 * ${invNorm(
                 "(CAST(dm.mr2 AS DOUBLE) / (2.0 * (mo.n + 1)))")})
      |           AS BIGINT) AS sy
      |  FROM g JOIN qm USING (qv) JOIN dm USING (dv) CROSS JOIN mo),
      |ag AS (
      |  SELECT sum(c) AS n, sum(CAST(c AS HUGEINT) * sx) AS sxs,
      |         sum(CAST(c AS HUGEINT) * sy) AS sys,
      |         sum(CAST(c AS HUGEINT) * sx * sy) AS sxy,
      |         sum(CAST(c AS HUGEINT) * sx * sx) AS sxx,
      |         sum(CAST(c AS HUGEINT) * sy * sy) AS syy
      |  FROM sc)
      |SELECT CAST(n AS BIGINT) AS n_lines,
      |       CAST(CASE WHEN (n * sxx - sxs * sxs) = 0
      |                   OR (n * syy - sys * sys) = 0 THEN NULL
      |            ELSE floor(1000.0
      |              * (CAST(n * sxy - sxs * sys AS DOUBLE)
      |                 / sqrt(CAST(n * sxx - sxs * sxs AS DOUBLE)
      |                      * CAST(n * syy - sys * sys AS DOUBLE))))
      |            END AS BIGINT) AS vdw_corr_milli
      |FROM ag
      |""".stripMargin)) { (s, dir) =>
    val g = Tables.lineitem(s, dir)
      .groupBy(expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").as("qv"),
        expr("CAST(floor(l_discount * 1000 + 0.5) AS BIGINT)").as("dv"))
      .agg(count(lit(1)).as("c"))
      .materialize() // bounded (quantity × discount) histogram
    val mo = g.agg(sum(col("c")).as("n"))
    val wbq = Window.orderBy(col("qv"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val qm = g.groupBy(col("qv")).agg(sum(col("c")).as("c"))
      .select(col("qv"),
        (lit(2L) * coalesce(sum(col("c")).over(wbq), lit(0L))
          + col("c") + 1).as("qmr2"))
    val wbd = Window.orderBy(col("dv"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val dm = g.groupBy(col("dv")).agg(sum(col("c")).as("c"))
      .select(col("dv"),
        (lit(2L) * coalesce(sum(col("c")).over(wbd), lit(0L))
          + col("c") + 1).as("dmr2"))
    val sc = g.join(broadcast(qm), "qv").join(broadcast(dm), "dv")
      .crossJoin(broadcast(mo))
      .select(col("c"),
        expr("CAST(floor(1000000.0 * " +
          invNorm("(CAST(qmr2 AS DOUBLE) / (2.0 * (n + 1)))") +
          ") AS BIGINT)").as("sx"),
        expr("CAST(floor(1000000.0 * " +
          invNorm("(CAST(dmr2 AS DOUBLE) / (2.0 * (n + 1)))") +
          ") AS BIGINT)").as("sy"))
    sc.agg(sum(col("c")).as("n"),
        sum(col("c").cast("decimal(38,0)") * col("sx")).as("sxs"),
        sum(col("c").cast("decimal(38,0)") * col("sy")).as("sys"),
        sum(col("c").cast("decimal(38,0)") * col("sx") * col("sy"))
          .as("sxy"),
        sum(col("c").cast("decimal(38,0)") * col("sx") * col("sx"))
          .as("sxx"),
        sum(col("c").cast("decimal(38,0)") * col("sy") * col("sy"))
          .as("syy"))
      .select(col("n").cast("long").as("n_lines"),
        expr("""CAST(CASE WHEN (n * sxx - sxs * sxs) = 0
          |            OR (n * syy - sys * sys) = 0 THEN NULL
          | ELSE floor(1000.0
          |   * (CAST(n * sxy - sxs * sys AS DOUBLE)
          |      / sqrt(CAST(n * sxx - sxs * sxs AS DOUBLE)
          |           * CAST(n * syy - sys * sys AS DOUBLE))))
          | END AS BIGINT)""".stripMargin.replace("\n", " "))
          .as("vdw_corr_milli"))
  }

  /** Shapiro–Francia-style normality audit of daily revenue: the
    * squared correlation between the ordered values and their Blom
    * rankits Φ⁻¹((i − 3/8)/(n + 1/4)) over the day dim. */
  def q1043: Q = Q(
    "q1043_qq_linearity",
    Some(s"""
      |WITH day AS (SELECT CAST(l_shipdate AS DATE) AS dd,
      |                    sum(CAST(l_extendedprice * 100 AS BIGINT))
      |                      AS z
      |             FROM lineitem GROUP BY 1),
      |rk AS (SELECT z, row_number() OVER (ORDER BY z, dd) AS i,
      |              count(*) OVER () AS n
      |       FROM day),
      |sc AS (SELECT CAST(z AS HUGEINT) AS x,
      |              CAST(floor(1000000.0 * ${invNorm(
                      "((CAST(i AS DOUBLE) - 0.375) / (CAST(n AS DOUBLE) + 0.25))")})
      |                AS BIGINT) AS y
      |       FROM rk),
      |ag AS (SELECT count(*) AS n, sum(x) AS sxs, sum(CAST(y AS HUGEINT))
      |              AS sys, sum(x * y) AS sxy, sum(x * x) AS sxx,
      |              sum(CAST(y AS HUGEINT) * y) AS syy
      |       FROM sc)
      |SELECT CAST(n AS BIGINT) AS n_days,
      |       CAST(floor(1000000.0
      |            * (CAST(n * sxy - sxs * sys AS DOUBLE)
      |               * CAST(n * sxy - sxs * sys AS DOUBLE))
      |            / (CAST(n * sxx - sxs * sxs AS DOUBLE)
      |               * CAST(n * syy - sys * sys AS DOUBLE))) AS BIGINT)
      |         AS w_prime_ppm
      |FROM ag
      |""".stripMargin)) { (s, dir) =>
    val day = Tables.lineitem(s, dir)
      .select(col("l_shipdate").cast("date").as("dd"),
        expr("CAST(CAST(l_extendedprice * 100 AS DECIMAL(38,0)) AS LONG)")
          .as("v"))
      .groupBy(col("dd")).agg(sum(col("v")).as("z"))
    val n1 = day.agg(count(lit(1)).as("n"))
    val rk = day
      .select(col("z"),
        row_number().over(Window.orderBy(col("z"), col("dd"))).as("i"))
      .crossJoin(broadcast(n1))
    val sc = rk.select(col("z").cast("decimal(38,0)").as("x"),
      expr("CAST(floor(1000000.0 * " +
        invNorm("((CAST(i AS DOUBLE) - 0.375) / (CAST(n AS DOUBLE) + 0.25))") +
        ") AS BIGINT)").as("y"))
    sc.agg(count(lit(1)).as("n"), sum(col("x")).as("sxs"),
        sum(col("y").cast("decimal(38,0)")).as("sys"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y").cast("decimal(38,0)") * col("y")).as("syy"))
      .select(col("n").cast("long").as("n_days"),
        expr("""CAST(floor(1000000.0
          | * (CAST(n * sxy - sxs * sys AS DOUBLE)
          |    * CAST(n * sxy - sxs * sys AS DOUBLE))
          | / (CAST(n * sxx - sxs * sxs AS DOUBLE)
          |    * CAST(n * syy - sys * sys AS DOUBLE))) AS BIGINT)"""
          .stripMargin.replace("\n", " ")).as("w_prime_ppm"))
  }

  /** Rankit outliers: the 5 most extreme daily revenues by |rankit
    * z| = |z − mean| standardized against the rankit-implied sigma
    * (the Q-Q slope) — reported as the exact day values plus the
    * micro-quantized rankit. */
  def q1044: Q = Q(
    "q1044_rankit_extremes",
    Some(s"""
      |WITH day AS (SELECT CAST(l_shipdate AS DATE) AS dd,
      |                    sum(CAST(l_extendedprice * 100 AS BIGINT))
      |                      AS z
      |             FROM lineitem GROUP BY 1),
      |rk AS (SELECT dd, z, row_number() OVER (ORDER BY z, dd) AS i,
      |              count(*) OVER () AS n
      |       FROM day),
      |sc AS (SELECT dd, z, i,
      |              CAST(floor(1000000.0 * ${invNorm(
                      "((CAST(i AS DOUBLE) - 0.375) / (CAST(n AS DOUBLE) + 0.25))")})
      |                AS BIGINT) AS rankit_micro
      |       FROM rk)
      |SELECT CAST(i AS BIGINT) AS value_rank,
      |       CAST(z AS BIGINT) AS revenue_cents,
      |       CAST(rankit_micro AS BIGINT) AS rankit_micro
      |FROM sc ORDER BY abs(rankit_micro) DESC, i LIMIT 5
      |""".stripMargin)) { (s, dir) =>
    val day = Tables.lineitem(s, dir)
      .select(col("l_shipdate").cast("date").as("dd"),
        expr("CAST(CAST(l_extendedprice * 100 AS DECIMAL(38,0)) AS LONG)")
          .as("v"))
      .groupBy(col("dd")).agg(sum(col("v")).as("z"))
    val n1 = day.agg(count(lit(1)).as("n"))
    day.select(col("dd"), col("z"),
        row_number().over(Window.orderBy(col("z"), col("dd"))).as("i"))
      .crossJoin(broadcast(n1))
      .select(col("i"), col("z"),
        expr("CAST(floor(1000000.0 * " +
          invNorm("((CAST(i AS DOUBLE) - 0.375) / (CAST(n AS DOUBLE) + 0.25))") +
          ") AS BIGINT)").as("rankit_micro"))
      .orderBy(abs(col("rankit_micro")).desc, col("i")).limit(5)
      .select(col("i").cast("long").as("value_rank"),
        col("z").cast("long").as("revenue_cents"),
        col("rankit_micro"))
  }

  /** Φ⁻¹ self-audit: the portable inverse normal evaluated on a fixed
    * probability grid — pins the shared Acklam expression itself
    * cross-engine (any transcription slip fails loudly here first). */
  def q1045: Q = Q(
    "q1045_invnorm_grid",
    Some(s"""
      |WITH pg AS (SELECT * FROM (VALUES (1),(25),(100),(250),(500),
      |            (750),(900),(975),(999)) v(pm))
      |SELECT CAST(pm AS BIGINT) AS permille,
      |       CAST(floor(1000000.0 * ${invNorm(
               "(CAST(pm AS DOUBLE) / 1000.0)")}) AS BIGINT)
      |         AS invnorm_micro
      |FROM pg ORDER BY permille
      |""".stripMargin)) { (s, dir) =>
    import s.implicits._
    Seq(1L, 25L, 100L, 250L, 500L, 750L, 900L, 975L, 999L).toDF("pm")
      .select(col("pm").cast("long").as("permille"),
        expr("CAST(floor(1000000.0 * " +
          invNorm("(CAST(pm AS DOUBLE) / 1000.0)") +
          ") AS BIGINT)").as("invnorm_micro"))
      .orderBy(col("permille"))
  }
}
