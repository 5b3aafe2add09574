package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables

/** Round-9 multivariate-moment wave on the day-grain (revenue,
  * quantity) vector: Mardia's multivariate skewness b₁,₂ (full pair
  * double sum) and kurtosis b₂,₂, the Mahalanobis χ²₂ outlier-day
  * audit, Hotelling's two-sample T² for the weekend-vs-weekday mean
  * vector, and the standardized co-skewness pair s₂₁/s₁₂.
  *
  * Scale: the day panel is calendar-bounded, so the O(n²) Mardia pair
  * frame is constant-size. Scatter entries A/B/C and all central
  * co-moments come from n-cleared EXACT integer identities
  * (n²M₂₁ = n²Σx²y − 2nSxSxy − nSySxx + 2Sx²Sy, verified); the
  * Mahalanobis kernel z_ij = (B·uxᵢuxⱼ − C(uxᵢuyⱼ+uyᵢuxⱼ) + A·uyᵢuyⱼ)
  * /det is a pinned double from those integers (det would overflow
  * DECIMAL(38) beyond sf0.1, so the DIVISION is double — documented),
  * with per-pair DECIMAL(18,9) quantization before exact sums. */
object MultivariateQueries {

  val all: Seq[Q] = Seq(q906, q907, q908, q909, q910)

  private def sqlMo: String = """
    |day AS (SELECT CAST(l_shipdate AS DATE) AS d,
    |               sum(CAST(l_extendedprice * 100 AS BIGINT)) AS x,
    |               sum(CAST(l_quantity AS BIGINT)) AS y
    |        FROM lineitem GROUP BY 1),
    |mo AS (SELECT count(*) AS n, sum(CAST(x AS HUGEINT)) AS sx,
    |              sum(CAST(y AS HUGEINT)) AS sy,
    |              sum(CAST(x AS HUGEINT) * x) AS sxx,
    |              sum(CAST(y AS HUGEINT) * y) AS syy,
    |              sum(CAST(x AS HUGEINT) * y) AS sxy
    |       FROM day),
    |ab AS (SELECT n, sx, sy,
    |              n * sxx - sx * sx AS a, n * syy - sy * sy AS b,
    |              n * sxy - sx * sy AS c
    |       FROM mo)""".stripMargin

  private def dayBase(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_shipdate").cast("date").as("d"),
        expr("CAST(CAST(l_extendedprice * 100 AS DECIMAL(38,0)) AS LONG)")
          .as("v"), col("l_quantity").cast("long").as("q"))
      .groupBy(col("d"))
      .agg(sum(col("v")).as("x"), sum(col("q")).as("y"))

  private def abBase(day: DataFrame): DataFrame =
    day.select(col("x").cast("decimal(38,0)").as("xd"),
        col("y").cast("decimal(38,0)").as("yd"))
      .agg(count(lit(1)).as("n"), sum(col("xd")).as("sx"),
        sum(col("yd")).as("sy"), sum(col("xd") * col("xd")).as("sxx"),
        sum(col("yd") * col("yd")).as("syy"),
        sum(col("xd") * col("yd")).as("sxy"))
      .select(col("n"), col("sx"), col("sy"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("a"),
        (col("n") * col("syy") - col("sy") * col("sy")).as("b"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("c"))

  /** The pinned z_ij kernel text (u = n·value − S, det as double). */
  private def zSql(ux1: String, uy1: String, ux2: String, uy2: String)
      : String =
    s"""(CAST(b AS DOUBLE) * $ux1 * $ux2
       |  - CAST(c AS DOUBLE) * ($ux1 * $uy2 + $uy1 * $ux2)
       |  + CAST(a AS DOUBLE) * $uy1 * $uy2)
       | / (CAST(a AS DOUBLE) * CAST(b AS DOUBLE)
       |    - CAST(c AS DOUBLE) * CAST(c AS DOUBLE))""".stripMargin

  /** Mardia multivariate skewness b₁,₂ = mean over all pairs of
    * z_ij³ (0 under bivariate normality). */
  def q906: Q = Q(
    "q906_mardia_skewness",
    Some(s"""
      |WITH ${sqlMo},
      |uu AS (SELECT ab.n * CAST(day.x AS HUGEINT) - ab.sx AS ux,
      |              ab.n * CAST(day.y AS HUGEINT) - ab.sy AS uy,
      |              day.d
      |       FROM day CROSS JOIN ab),
      |zt AS (SELECT CAST(pow(
      |         ${zSql("CAST(i.ux AS DOUBLE)", "CAST(i.uy AS DOUBLE)",
                        "CAST(j.ux AS DOUBLE)", "CAST(j.uy AS DOUBLE)")},
      |         3.0) AS DECIMAL(18,9)) AS z3
      |       FROM uu i CROSS JOIN uu j CROSS JOIN ab)
      |SELECT (SELECT CAST(n AS BIGINT) FROM ab) AS n_days,
      |       CAST(floor(1000.0 * CAST(sum(z3) AS DOUBLE)
      |            / ((SELECT CAST(n AS DOUBLE) FROM ab)
      |               * (SELECT n FROM ab))) AS BIGINT)
      |         AS mardia_skew_milli
      |FROM zt
      |""".stripMargin)) { (s, dir) =>
    val day = dayBase(s, dir).materialize()
    val ab = abBase(day).materialize()
    val uu = day.crossJoin(broadcast(ab))
      .select(col("d"),
        (col("n") * col("x") - col("sx")).cast("double").as("ux"),
        (col("n") * col("y") - col("sy")).cast("double").as("uy"))
      .materialize()
    val j = uu.select(col("ux").as("ux2"), col("uy").as("uy2"))
    uu.crossJoin(j).crossJoin(broadcast(ab))
      .select(expr(s"CAST(pow(${zSql("ux", "uy", "ux2", "uy2")}, 3.0)" +
        " AS DECIMAL(18,9))").as("z3"))
      .agg(sum(col("z3")).as("sz"))
      .crossJoin(broadcast(ab))
      .select(col("n").cast("long").as("n_days"),
        expr("""CAST(floor(1000.0 * CAST(sz AS DOUBLE)
          |  / (CAST(n AS DOUBLE) * n)) AS BIGINT)""".stripMargin)
          .as("mardia_skew_milli"))
  }

  /** Mardia kurtosis b₂,₂ = mean z_ii² (8 under bivariate normality). */
  def q907: Q = Q(
    "q907_mardia_kurtosis",
    Some(s"""
      |WITH ${sqlMo},
      |zt AS (SELECT CAST(pow(
      |         ${zSql("(ab.n * CAST(day.x AS DOUBLE) - CAST(ab.sx AS DOUBLE))",
                       "(ab.n * CAST(day.y AS DOUBLE) - CAST(ab.sy AS DOUBLE))",
                       "(ab.n * CAST(day.x AS DOUBLE) - CAST(ab.sx AS DOUBLE))",
                       "(ab.n * CAST(day.y AS DOUBLE) - CAST(ab.sy AS DOUBLE))")},
      |         2.0) AS DECIMAL(18,9)) AS z2
      |       FROM day CROSS JOIN ab)
      |SELECT CAST(floor(1000.0 * CAST(sum(z2) AS DOUBLE)
      |            / (SELECT n FROM ab)) AS BIGINT)
      |         AS mardia_kurt_milli,
      |       CAST(8000 AS BIGINT) AS gaussian_milli
      |FROM zt
      |""".stripMargin)) { (s, dir) =>
    val day = dayBase(s, dir)
    val ab = abBase(day).materialize()
    val ux = "(n * CAST(x AS DOUBLE) - CAST(sx AS DOUBLE))"
    val uy = "(n * CAST(y AS DOUBLE) - CAST(sy AS DOUBLE))"
    day.crossJoin(broadcast(ab))
      .select(expr(s"CAST(pow(${zSql(ux, uy, ux, uy)}, 2.0)" +
        " AS DECIMAL(18,9))").as("z2"))
      .agg(sum(col("z2")).as("sz"))
      .crossJoin(broadcast(ab))
      .select(expr("""CAST(floor(1000.0 * CAST(sz AS DOUBLE) / n)
          |  AS BIGINT)""".stripMargin).as("mardia_kurt_milli"),
        lit(8000L).as("gaussian_milli"))
  }

  /** Mahalanobis χ²₂ outlier days at the 95%/99% cutoffs. */
  def q908: Q = Q(
    "q908_mahalanobis_outliers",
    Some(s"""
      |WITH ${sqlMo},
      |zt AS (SELECT
      |  ${zSql("(ab.n * CAST(day.x AS DOUBLE) - CAST(ab.sx AS DOUBLE))",
                "(ab.n * CAST(day.y AS DOUBLE) - CAST(ab.sy AS DOUBLE))",
                "(ab.n * CAST(day.x AS DOUBLE) - CAST(ab.sx AS DOUBLE))",
                "(ab.n * CAST(day.y AS DOUBLE) - CAST(ab.sy AS DOUBLE))")}
      |    AS z
      |  FROM day CROSS JOIN ab)
      |SELECT CAST(count(*) AS BIGINT) AS n_days,
      |       CAST(sum(CASE WHEN z > 5.991465 THEN 1 ELSE 0 END)
      |            AS BIGINT) AS n_out_95,
      |       CAST(sum(CASE WHEN z > 9.210340 THEN 1 ELSE 0 END)
      |            AS BIGINT) AS n_out_99
      |FROM zt
      |""".stripMargin)) { (s, dir) =>
    val day = dayBase(s, dir)
    val ab = abBase(day).materialize()
    val ux = "(n * CAST(x AS DOUBLE) - CAST(sx AS DOUBLE))"
    val uy = "(n * CAST(y AS DOUBLE) - CAST(sy AS DOUBLE))"
    day.crossJoin(broadcast(ab))
      .select(expr(zSql(ux, uy, ux, uy)).as("z"))
      .agg(count(lit(1)).as("nd"),
        sum(when(col("z") > 5.991465, 1).otherwise(0)).as("o95"),
        sum(when(col("z") > 9.210340, 1).otherwise(0)).as("o99"))
      .select(col("nd").cast("long").as("n_days"),
        col("o95").cast("long").as("n_out_95"),
        col("o99").cast("long").as("n_out_99"))
  }

  /** Hotelling two-sample T² on the weekend-vs-weekday (rev, qty)
    * mean vector, pooled-covariance form — one pinned double chain
    * from exact group moments. */
  def q909: Q = Q(
    "q909_hotelling_t2",
    Some(s"""
      |WITH day AS (SELECT CAST(l_shipdate AS DATE) AS d,
      |               sum(CAST(l_extendedprice * 100 AS BIGINT)) AS x,
      |               sum(CAST(l_quantity AS BIGINT)) AS y
      |             FROM lineitem GROUP BY 1),
      |gm AS (SELECT CASE WHEN isodow(d) >= 6 THEN 1 ELSE 0 END AS g,
      |              count(*) AS n, sum(CAST(x AS HUGEINT)) AS sx,
      |              sum(CAST(y AS HUGEINT)) AS sy,
      |              sum(CAST(x AS HUGEINT) * x) AS sxx,
      |              sum(CAST(y AS HUGEINT) * y) AS syy,
      |              sum(CAST(x AS HUGEINT) * y) AS sxy
      |       FROM day GROUP BY 1),
      |tw AS (SELECT
      |  max(CASE WHEN g = 1 THEN n END) AS n1,
      |  max(CASE WHEN g = 0 THEN n END) AS n2,
      |  max(CASE WHEN g = 1 THEN CAST(sx AS DOUBLE) / n END) AS mx1,
      |  max(CASE WHEN g = 0 THEN CAST(sx AS DOUBLE) / n END) AS mx2,
      |  max(CASE WHEN g = 1 THEN CAST(sy AS DOUBLE) / n END) AS my1,
      |  max(CASE WHEN g = 0 THEN CAST(sy AS DOUBLE) / n END) AS my2,
      |  sum(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) AS wxx,
      |  sum(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n) AS wyy,
      |  sum(CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n) AS wxy
      |  FROM gm)
      |SELECT CAST(n1 AS BIGINT) AS n_weekend,
      |       CAST(n2 AS BIGINT) AS n_weekday,
      |       CAST(floor(1000.0
      |         * (CAST(n1 AS DOUBLE) * n2 / (n1 + n2)) * (n1 + n2 - 2)
      |         * ((mx1 - mx2) * (wyy * (mx1 - mx2) - wxy * (my1 - my2))
      |            + (my1 - my2) * (wxx * (my1 - my2)
      |                             - wxy * (mx1 - mx2)))
      |         / (wxx * wyy - wxy * wxy)) AS BIGINT) AS t2_milli
      |FROM tw
      |""".stripMargin)) { (s, dir) =>
    val gm = dayBase(s, dir)
      .select(when(expr("weekday(d) >= 5"), 1).otherwise(0).as("g"),
        col("x").cast("decimal(38,0)").as("xd"),
        col("y").cast("decimal(38,0)").as("yd"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("xd")).as("sx"),
        sum(col("yd")).as("sy"), sum(col("xd") * col("xd")).as("sxx"),
        sum(col("yd") * col("yd")).as("syy"),
        sum(col("xd") * col("yd")).as("sxy"))
    gm.agg(
        max(when(col("g") === 1, col("n"))).as("n1"),
        max(when(col("g") === 0, col("n"))).as("n2"),
        max(when(col("g") === 1, expr("CAST(sx AS DOUBLE) / n"))).as("mx1"),
        max(when(col("g") === 0, expr("CAST(sx AS DOUBLE) / n"))).as("mx2"),
        max(when(col("g") === 1, expr("CAST(sy AS DOUBLE) / n"))).as("my1"),
        max(when(col("g") === 0, expr("CAST(sy AS DOUBLE) / n"))).as("my2"),
        sum(expr("CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n"))
          .as("wxx"),
        sum(expr("CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n"))
          .as("wyy"),
        sum(expr("CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n"))
          .as("wxy"))
      .select(col("n1").cast("long").as("n_weekend"),
        col("n2").cast("long").as("n_weekday"),
        expr("""CAST(floor(1000.0
          |  * (CAST(n1 AS DOUBLE) * n2 / (n1 + n2)) * (n1 + n2 - 2)
          |  * ((mx1 - mx2) * (wyy * (mx1 - mx2) - wxy * (my1 - my2))
          |     + (my1 - my2) * (wxx * (my1 - my2) - wxy * (mx1 - mx2)))
          |  / (wxx * wyy - wxy * wxy)) AS BIGINT)""".stripMargin)
          .as("t2_milli"))
  }

  /** Standardized co-skewness s₂₁ = M₂₁/(σx²σy), s₁₂ = M₁₂/(σxσy²)
    * from the verified n-cleared integer identities. */
  def q910: Q = Q(
    "q910_coskewness",
    Some(s"""
      |WITH ${sqlMo},
      |m3 AS (SELECT sum(CAST(x AS HUGEINT) * x * y) AS sxxy,
      |              sum(CAST(x AS HUGEINT) * y * y) AS sxyy
      |       FROM day),
      |cm AS (SELECT ab.n, ab.a, ab.b,
      |  CAST(ab.n AS DOUBLE) * ab.n * m3.sxxy
      |    - 2.0 * ab.n * CAST(ab.sx AS DOUBLE) * mo.sxy
      |    - CAST(ab.n AS DOUBLE) * ab.sy * mo.sxx
      |    + 2.0 * CAST(ab.sx AS DOUBLE) * ab.sx * ab.sy AS m21,
      |  CAST(ab.n AS DOUBLE) * ab.n * m3.sxyy
      |    - 2.0 * ab.n * CAST(ab.sy AS DOUBLE) * mo.sxy
      |    - CAST(ab.n AS DOUBLE) * ab.sx * mo.syy
      |    + 2.0 * CAST(ab.sy AS DOUBLE) * ab.sy * ab.sx AS m12
      |  FROM ab CROSS JOIN mo CROSS JOIN m3)
      |SELECT CAST(floor(1000.0 * (m21 / n)
      |            / ((CAST(a AS DOUBLE) / n)
      |               * sqrt(CAST(b AS DOUBLE) / n))) AS BIGINT)
      |         AS coskew_xxy_milli,
      |       CAST(floor(1000.0 * (m12 / n)
      |            / (sqrt(CAST(a AS DOUBLE) / n)
      |               * (CAST(b AS DOUBLE) / n))) AS BIGINT)
      |         AS coskew_xyy_milli
      |FROM cm
      |""".stripMargin)) { (s, dir) =>
    val day = dayBase(s, dir).materialize()
    val ab = abBase(day)
    val mo = day.select(col("x").cast("decimal(38,0)").as("xd"),
        col("y").cast("decimal(38,0)").as("yd"))
      .agg(sum(col("xd") * col("xd")).as("sxx"),
        sum(col("yd") * col("yd")).as("syy"),
        sum(col("xd") * col("yd")).as("sxy"),
        sum(col("xd") * col("xd") * col("yd")).as("sxxy"),
        sum(col("xd") * col("yd") * col("yd")).as("sxyy"))
    ab.crossJoin(broadcast(mo))
      .select(col("n"), col("a"), col("b"),
        expr("""CAST(n AS DOUBLE) * n * sxxy
          |  - 2.0 * n * CAST(sx AS DOUBLE) * sxy
          |  - CAST(n AS DOUBLE) * sy * sxx
          |  + 2.0 * CAST(sx AS DOUBLE) * sx * sy""".stripMargin)
          .as("m21"),
        expr("""CAST(n AS DOUBLE) * n * sxyy
          |  - 2.0 * n * CAST(sy AS DOUBLE) * sxy
          |  - CAST(n AS DOUBLE) * sx * syy
          |  + 2.0 * CAST(sy AS DOUBLE) * sy * sx""".stripMargin)
          .as("m12"))
      .select(
        expr("""CAST(floor(1000.0 * (m21 / n)
          |  / ((CAST(a AS DOUBLE) / n) * sqrt(CAST(b AS DOUBLE) / n)))
          |  AS BIGINT)""".stripMargin).as("coskew_xxy_milli"),
        expr("""CAST(floor(1000.0 * (m12 / n)
          |  / (sqrt(CAST(a AS DOUBLE) / n) * (CAST(b AS DOUBLE) / n)))
          |  AS BIGINT)""".stripMargin).as("coskew_xyy_milli"))
  }
}
