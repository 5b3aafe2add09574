package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-11 brand-portfolio wave: each brand's daily-revenue series
  * as an "asset" against the all-brand market series — CAPM beta,
  * Jensen alpha, a Sharpe-style mean/volatility ratio, the two-asset
  * minimum-variance portfolio, and the brand–market correlation tail
  * (the diversifiers).
  *
  * Exactness: every moment is an exact integer sum over revenue cents
  * (missing (brand, day) cells contribute zero to every product, so
  * inner joins are exact; day count T enters the formulas explicitly);
  * beta / alpha / portfolio weights are exact integer rationals
  * finished with `div`, correlations and Sharpe with one shared-text
  * double step. Products ride DECIMAL(38,0)/HUGEINT — headroom is
  * explicit: the deepest product (alpha's num·Σz_m) works in DOLLARS
  * (cents div 100) to keep ~1e37 at sf 1.
  *
  * Scale: ONE lineitem pass builds the (brand, day) spine (≤25 ×
  * calendar rows, a SpineCache table); the market series is its
  * day-sum; every statistic is brand×day-dim work. */
object BrandPortfolioQueries {

  val all: Seq[Q] = Seq(q1061, q1062, q1063, q1064, q1065)

  /** Oracle CTEs: bd(br, dd, z), m(dd, zm), gt(t) = day count. */
  private def sqlBd: String = """
    |bd AS MATERIALIZED (
    |  SELECT p.p_brand AS br, CAST(l.l_shipdate AS DATE) AS dd,
    |         sum(CAST(l.l_extendedprice * 100 AS BIGINT)) AS z
    |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    |  GROUP BY 1, 2),
    |m AS (SELECT dd, sum(z) AS zm FROM bd GROUP BY 1),
    |gt AS (SELECT count(*) AS t FROM m)""".stripMargin

  /** Spark twin: the (brand, day) revenue spine. */
  private[queries] def brandDay(s: SparkSession, dir: String): DataFrame =
    graft.sources.SpineCache.table(s, dir, "brand_day_revenue",
      Seq("lineitem", "part")) {
      Tables.lineitem(s, dir)
        .select(col("l_partkey").as("pk"),
          col("l_shipdate").cast("date").as("dd"),
          expr("CAST(CAST(l_extendedprice * 100 AS DECIMAL(38,0))" +
            " AS LONG)").as("v"))
        .join(broadcast(Tables.part(s, dir)
          .select(col("p_partkey").as("pk"), col("p_brand").as("br"))),
          "pk")
        .groupBy(col("br"), col("dd"))
        .agg(sum(col("v")).as("z"))
    }

  /** Per-brand exact moments against the market: (br, nd, sb, sb2,
    * sbm) + market scalars (t, sm, sm2) — the shared frame. */
  private def sqlMoments: String = s"""
    |${sqlBd},
    |mk AS (SELECT gt.t, sum(zm) AS sm,
    |              sum(CAST(zm AS HUGEINT) * zm) AS sm2
    |       FROM m CROSS JOIN gt GROUP BY 1),
    |bm AS (
    |  SELECT bd.br, count(*) AS nd, sum(bd.z) AS sb,
    |         sum(CAST(bd.z AS HUGEINT) * bd.z) AS sb2,
    |         sum(CAST(bd.z AS HUGEINT) * m.zm) AS sbm
    |  FROM bd JOIN m ON m.dd = bd.dd GROUP BY 1)""".stripMargin

  private def moments(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val bd = brandDay(s, dir)
    val m = bd.groupBy(col("dd")).agg(sum(col("z")).as("zm"))
    val mk = m.agg(count(lit(1)).as("t"), sum(col("zm")).as("sm"),
      sum(expr("CAST(zm AS DECIMAL(38,0)) * zm")).as("sm2"))
    val bm = bd.join(m, "dd")
      .groupBy(col("br"))
      .agg(count(lit(1)).as("nd"), sum(col("z")).as("sb"),
        sum(expr("CAST(z AS DECIMAL(38,0)) * z")).as("sb2"),
        sum(expr("CAST(z AS DECIMAL(38,0)) * zm")).as("sbm"))
    (bm, mk)
  }

  /** CAPM beta per brand (top 10): cov(b, m)/var(m) as an exact
    * rational over cents moments. */
  def q1061: Q = Q(
    "q1061_brand_beta",
    Some(s"""
      |WITH ${sqlMoments}
      |SELECT br AS brand, CAST(nd AS BIGINT) AS n_days_active,
      |       CAST((1000 * (mk.t * sbm - CAST(sb AS HUGEINT) * sm))
      |            // (mk.t * sm2 - CAST(sm AS HUGEINT) * sm) AS BIGINT)
      |         AS beta_milli
      |FROM bm CROSS JOIN mk
      |ORDER BY beta_milli DESC, brand LIMIT 10
      |""".stripMargin)) { (s, dir) =>
    val (bm, mk) = moments(s, dir)
    bm.crossJoin(broadcast(mk))
      .select(col("br").as("brand"), col("nd").as("n_days_active"),
        expr("CAST((1000 * (t * sbm - CAST(sb AS DECIMAL(38,0)) * sm))" +
          " div (t * sm2 - CAST(sm AS DECIMAL(38,0)) * sm) AS BIGINT)")
          .as("beta_milli"))
      .orderBy(col("beta_milli").desc, col("brand")).limit(10)
  }

  /** Jensen alpha per brand (top 10), in DOLLARS per day: mean_b −
    * beta·mean_m as one exact rational (dollar-quantized inputs keep
    * the triple product inside DECIMAL(38,0)). */
  def q1062: Q = Q(
    "q1062_brand_alpha",
    Some(s"""
      |WITH ${sqlBd},
      |mdd AS (SELECT dd, zm // 100 AS zm FROM m),
      |gt2 AS (SELECT count(*) AS t FROM mdd),
      |mk AS (SELECT gt2.t, sum(zm) AS sm,
      |               sum(CAST(zm AS HUGEINT) * zm) AS sm2
      |        FROM mdd CROSS JOIN gt2 GROUP BY 1),
      |bm AS (
      |  SELECT bd.br, count(*) AS nd, sum(bd.z // 100) AS sb,
      |         sum(CAST(bd.z // 100 AS HUGEINT) * mdd.zm) AS sbm
      |  FROM bd JOIN mdd ON mdd.dd = bd.dd GROUP BY 1),
      |ab AS (
      |  SELECT br, nd,
      |         mk.t * sbm - CAST(sb AS HUGEINT) * sm AS num,
      |         mk.t * sm2 - CAST(sm AS HUGEINT) * sm AS den,
      |         sb, sm, mk.t
      |  FROM bm CROSS JOIN mk)
      |SELECT br AS brand, CAST(nd AS BIGINT) AS n_days_active,
      |       CAST((CAST(sb AS HUGEINT) * den - num * sm)
      |            // (CAST(t AS HUGEINT) * den) AS BIGINT)
      |         AS alpha_dollars
      |FROM ab ORDER BY alpha_dollars DESC, brand LIMIT 10
      |""".stripMargin)) { (s, dir) =>
    val bd = brandDay(s, dir)
    val mdd = bd.groupBy(col("dd"))
      .agg(expr("sum(z) div 100").as("zm"))
    val mk = mdd.agg(count(lit(1)).as("t"), sum(col("zm")).as("sm"),
      sum(expr("CAST(zm AS DECIMAL(38,0)) * zm")).as("sm2"))
    val bm = bd.join(mdd, "dd")
      .groupBy(col("br"))
      .agg(count(lit(1)).as("nd"), sum(expr("z div 100")).as("sb"),
        sum(expr("CAST(z div 100 AS DECIMAL(38,0)) * zm")).as("sbm"))
    bm.crossJoin(broadcast(mk))
      .select(col("br").as("brand"), col("nd").as("n_days_active"),
        expr("t * sbm - CAST(sb AS DECIMAL(38,0)) * sm").as("num"),
        expr("t * sm2 - CAST(sm AS DECIMAL(38,0)) * sm").as("den"),
        col("sb"), col("sm"), col("t"))
      .select(col("brand"), col("n_days_active"),
        expr("CAST((CAST(sb AS DECIMAL(38,0)) * den - num * sm)" +
          " div (CAST(t AS DECIMAL(38,0)) * den) AS BIGINT)")
          .as("alpha_dollars"))
      .orderBy(col("alpha_dollars").desc, col("brand")).limit(10)
  }

  /** Sharpe-style ratio per brand (top 10): mean daily revenue over
    * its volatility, exact operands + one double step. */
  def q1063: Q = Q(
    "q1063_brand_sharpe",
    Some(s"""
      |WITH ${sqlMoments}
      |SELECT br AS brand, CAST(nd AS BIGINT) AS n_days_active,
      |       CAST(floor(1000.0 * CAST(sb AS DOUBLE)
      |            / sqrt(CAST(mk.t * sb2
      |                 - CAST(sb AS HUGEINT) * sb AS DOUBLE)))
      |            AS BIGINT) AS sharpe_milli
      |FROM bm CROSS JOIN mk
      |ORDER BY sharpe_milli DESC, brand LIMIT 10
      |""".stripMargin)) { (s, dir) =>
    val (bm, mk) = moments(s, dir)
    bm.crossJoin(broadcast(mk))
      .select(col("br").as("brand"), col("nd").as("n_days_active"),
        expr("CAST(floor(1000.0 * CAST(sb AS DOUBLE)" +
          " / sqrt(CAST(t * sb2" +
          " - CAST(sb AS DECIMAL(38,0)) * sb AS DOUBLE))) AS BIGINT)")
          .as("sharpe_milli"))
      .orderBy(col("sharpe_milli").desc, col("brand")).limit(10)
  }

  /** Two-asset minimum-variance portfolio over the top-2 brands by
    * total revenue: exact rational weights and the pair correlation. */
  def q1064: Q = Q(
    "q1064_min_variance_pair",
    Some(s"""
      |WITH ${sqlBd},
      |top2 AS (SELECT br, sum(z) AS tz,
      |                row_number() OVER (ORDER BY sum(z) DESC, br) AS rk
      |         FROM bd GROUP BY 1 QUALIFY rk <= 2),
      |s1 AS (SELECT bd.dd, bd.z FROM bd JOIN top2 ON top2.br = bd.br
      |       AND top2.rk = 1),
      |s2 AS (SELECT bd.dd, bd.z FROM bd JOIN top2 ON top2.br = bd.br
      |       AND top2.rk = 2),
      |mo AS (
      |  SELECT gt.t,
      |         (SELECT sum(z) FROM s1) AS a1,
      |         (SELECT sum(CAST(z AS HUGEINT) * z) FROM s1) AS a2,
      |         (SELECT sum(z) FROM s2) AS b1,
      |         (SELECT sum(CAST(z AS HUGEINT) * z) FROM s2) AS b2,
      |         (SELECT sum(CAST(s1.z AS HUGEINT) * s2.z)
      |          FROM s1 JOIN s2 ON s1.dd = s2.dd) AS ab
      |  FROM gt),
      |sv AS (SELECT t,
      |              t * a2 - CAST(a1 AS HUGEINT) * a1 AS v1,
      |              t * b2 - CAST(b1 AS HUGEINT) * b1 AS v2,
      |              t * ab - CAST(a1 AS HUGEINT) * b1 AS cv
      |       FROM mo)
      |SELECT (SELECT br FROM top2 WHERE rk = 1) AS brand_1,
      |       (SELECT br FROM top2 WHERE rk = 2) AS brand_2,
      |       CAST((1000 * (v2 - cv)) // (v1 + v2 - 2 * cv) AS BIGINT)
      |         AS w1_milli,
      |       CAST((1000 * (v1 - cv)) // (v1 + v2 - 2 * cv) AS BIGINT)
      |         AS w2_milli,
      |       CAST(floor(1000.0 * CAST(cv AS DOUBLE)
      |            / sqrt(CAST(v1 AS DOUBLE) * CAST(v2 AS DOUBLE)))
      |            AS BIGINT) AS corr_milli
      |FROM sv
      |""".stripMargin)) { (s, dir) =>
    val bd = brandDay(s, dir)
    val top2 = bd.groupBy(col("br")).agg(sum(col("z")).as("tz"))
      .orderBy(col("tz").desc, col("br")).limit(2)
      .select(col("br"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("tz").desc, col("br"))).as("rk"))
    val s1 = bd.join(broadcast(top2.where(col("rk") === 1)
      .select(col("br"))), "br").select(col("dd"), col("z"))
    val s2 = bd.join(broadcast(top2.where(col("rk") === 2)
      .select(col("br"))), "br")
      .select(col("dd").as("dd2"), col("z").as("z2"))
    val t = bd.select(col("dd")).distinct().agg(count(lit(1)).as("t"))
    val a = s1.agg(sum(col("z")).as("a1"),
      sum(expr("CAST(z AS DECIMAL(38,0)) * z")).as("a2"))
    val b = s2.agg(sum(col("z2")).as("b1"),
      sum(expr("CAST(z2 AS DECIMAL(38,0)) * z2")).as("b2"))
    val ab = s1.join(s2, col("dd") === col("dd2"))
      .agg(sum(expr("CAST(z AS DECIMAL(38,0)) * z2")).as("ab"))
    val names = top2.groupBy()
      .agg(min_by(col("br"), col("rk")).as("brand_1"),
        max_by(col("br"), col("rk")).as("brand_2"))
    t.crossJoin(broadcast(a)).crossJoin(broadcast(b))
      .crossJoin(broadcast(ab)).crossJoin(broadcast(names))
      .select(col("brand_1"), col("brand_2"),
        expr("t * a2 - CAST(a1 AS DECIMAL(38,0)) * a1").as("v1"),
        expr("t * b2 - CAST(b1 AS DECIMAL(38,0)) * b1").as("v2"),
        expr("t * ab - CAST(a1 AS DECIMAL(38,0)) * b1").as("cv"))
      .select(col("brand_1"), col("brand_2"),
        expr("CAST((1000 * (v2 - cv)) div (v1 + v2 - 2 * cv)" +
          " AS BIGINT)").as("w1_milli"),
        expr("CAST((1000 * (v1 - cv)) div (v1 + v2 - 2 * cv)" +
          " AS BIGINT)").as("w2_milli"),
        expr("CAST(floor(1000.0 * CAST(cv AS DOUBLE)" +
          " / sqrt(CAST(v1 AS DOUBLE) * CAST(v2 AS DOUBLE)))" +
          " AS BIGINT)").as("corr_milli"))
  }

  /** Brand–market correlation bottom 10 — the diversifiers. */
  def q1065: Q = Q(
    "q1065_brand_market_corr",
    Some(s"""
      |WITH ${sqlMoments}
      |SELECT br AS brand, CAST(nd AS BIGINT) AS n_days_active,
      |       CAST(floor(1000000.0
      |            * CAST(mk.t * sbm - CAST(sb AS HUGEINT) * sm AS DOUBLE)
      |            / sqrt(CAST(mk.t * sb2
      |                 - CAST(sb AS HUGEINT) * sb AS DOUBLE)
      |               * CAST(mk.t * sm2
      |                 - CAST(sm AS HUGEINT) * sm AS DOUBLE)))
      |            AS BIGINT) AS corr_micro
      |FROM bm CROSS JOIN mk
      |ORDER BY corr_micro, brand LIMIT 10
      |""".stripMargin)) { (s, dir) =>
    val (bm, mk) = moments(s, dir)
    bm.crossJoin(broadcast(mk))
      .select(col("br").as("brand"), col("nd").as("n_days_active"),
        expr("CAST(floor(1000000.0" +
          " * CAST(t * sbm - CAST(sb AS DECIMAL(38,0)) * sm AS DOUBLE)" +
          " / sqrt(CAST(t * sb2" +
          " - CAST(sb AS DECIMAL(38,0)) * sb AS DOUBLE)" +
          " * CAST(t * sm2" +
          " - CAST(sm AS DECIMAL(38,0)) * sm AS DOUBLE))) AS BIGINT)")
          .as("corr_micro"))
      .orderBy(col("corr_micro"), col("brand")).limit(10)
  }
}
