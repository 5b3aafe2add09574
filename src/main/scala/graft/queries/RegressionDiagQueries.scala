package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables

/** Round-8 regression-diagnostics wave: Grubbs' outlier test and
  * Jarque–Bera normality on the daily net series, Cook's-distance
  * influence ranking and the Goldfeld–Quandt heteroscedasticity test
  * on the order-value regression, and Bartlett's variance-homogeneity
  * test across brands. Residual sums of squares use the exact
  * centered closed form (S_yy·S_xx − S_xy²)/(n·S_xx) — per-row
  * squared residuals are never summed as floats. */
object RegressionDiagQueries {

  val all: Seq[Q] = Seq(q611, q612, q613, q614, q615)

  private def dailyNetSql: String = DailyNet.sql

  private def dailyNet(s: SparkSession, dir: String): DataFrame =
    DailyNet.frame(s, dir)

  /** Grubbs' test for a single outlier in daily net revenue:
    * G = max|x − x̄|/s from the n-scaled integer centering c = n·x − S
    * (G = max|c|/n / s), with the day that attains it. The
    * single-most-anomalous-day screen run before any robust-stats
    * hand-wringing. */
  def q611: Q = Q(
    "q611_grubbs_daily",
    Some(s"""
      |WITH ${dailyNetSql},
      |mo AS (SELECT count(*) AS n, sum(net) AS sv,
      |              sum(net * net) AS q2 FROM d),
      |cz AS (SELECT day, abs(CAST(mo.n AS HUGEINT) * net - mo.sv) AS ac
      |       FROM d CROSS JOIN mo),
      |mx AS (SELECT max(ac) AS maxc FROM cz),
      |fd AS (SELECT min(day) AS g_day FROM cz CROSS JOIN mx
      |       WHERE ac = mx.maxc)
      |SELECT CAST(mo.n AS BIGINT) AS n_days,
      |       CAST(fd.g_day AS BIGINT) AS g_day,
      |       CAST(floor(CAST(mx.maxc AS DOUBLE) / mo.n
      |         / sqrt(CAST(CAST(mo.n AS HUGEINT) * mo.q2
      |                - mo.sv * mo.sv AS DOUBLE)
      |                / (CAST(mo.n AS DOUBLE) * (mo.n - 1)))
      |         * 1000.0) AS BIGINT) AS g_milli
      |FROM mo CROSS JOIN mx CROSS JOIN fd
      |""".stripMargin)) { (s, dir) =>
    val d = dailyNet(s, dir).materialize()
    val mo = d.agg(count(lit(1)).as("n"), sum(col("net")).as("sv"),
      sum(col("net") * col("net")).as("q2"))
    val cz = d.crossJoin(broadcast(mo))
      .select(col("day"),
        abs(col("n").cast("decimal(38,0)") * col("net") - col("sv"))
          .as("ac"))
      .materialize()
    val mx = cz.agg(max(col("ac")).as("maxc"))
    val fd = cz.crossJoin(broadcast(mx)).where(col("ac") === col("maxc"))
      .agg(min(col("day")).as("g_day"))
    mo.crossJoin(broadcast(mx)).crossJoin(broadcast(fd))
      .select(col("n").as("n_days"), col("g_day"),
        expr("CAST(floor(CAST(maxc AS DOUBLE) / n" +
          " / sqrt(CAST(CAST(n AS DECIMAL(38,0)) * q2 - sv * sv" +
          " AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1)))" +
          " * 1000.0) AS BIGINT)").as("g_milli"))
  }

  /** Jarque–Bera normality test of daily net revenue in DOLLARS
    * (floored via the shared double-floor idiom — cents⁴ would
    * overflow HUGEINT at 10×): raw moments Σx..Σx⁴ are exact
    * integers; central moments, skewness, excess kurtosis and
    * JB = n/6·(g₁² + g₂²/4) are one pinned-double expression chain
    * evaluated identically by both engines. */
  def q612: Q = {
    val mu = "CAST(sv AS DOUBLE) / CAST(n AS DOUBLE)"
    val m2 = s"(CAST(q2 AS DOUBLE) / CAST(n AS DOUBLE) - ($mu) * ($mu))"
    val m3 = s"(CAST(q3 AS DOUBLE) / CAST(n AS DOUBLE)" +
      s" - 3.0 * ($mu) * CAST(q2 AS DOUBLE) / CAST(n AS DOUBLE)" +
      s" + 2.0 * ($mu) * ($mu) * ($mu))"
    val m4 = s"(CAST(q4 AS DOUBLE) / CAST(n AS DOUBLE)" +
      s" - 4.0 * ($mu) * CAST(q3 AS DOUBLE) / CAST(n AS DOUBLE)" +
      s" + 6.0 * ($mu) * ($mu) * CAST(q2 AS DOUBLE) / CAST(n AS DOUBLE)" +
      s" - 3.0 * ($mu) * ($mu) * ($mu) * ($mu))"
    val g1 = s"($m3 / sqrt($m2 * $m2 * $m2))"
    val g2 = s"($m4 / ($m2 * $m2) - 3.0)"
    Q("q612_jarque_bera",
      Some(s"""
        |WITH ${dailyNetSql},
        |x AS (SELECT CAST(floor(CAST(net AS DOUBLE) / 100.0) AS BIGINT)
        |             AS v FROM d),
        |mo AS (
        |  SELECT count(*) AS n, sum(v) AS sv,
        |         sum(CAST(v AS HUGEINT) * v) AS q2,
        |         sum(CAST(v AS HUGEINT) * v * v) AS q3,
        |         sum(CAST(v AS HUGEINT) * v * v * v) AS q4
        |  FROM x)
        |SELECT CAST(n AS BIGINT) AS n_days,
        |       CAST(floor($g1 * 1000.0) AS BIGINT) AS skew_milli,
        |       CAST(floor($g2 * 1000.0) AS BIGINT) AS exkurt_milli,
        |       CAST(floor(CAST(n AS DOUBLE) / 6.0
        |         * ($g1 * $g1 + $g2 * $g2 / 4.0) * 1000.0) AS BIGINT)
        |         AS jb_milli
        |FROM mo
        |""".stripMargin)) { (s, dir) =>
      val x = dailyNet(s, dir)
        .select(expr("CAST(floor(CAST(net AS DOUBLE) / 100.0) AS BIGINT)")
          .as("v"))
      x.agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
          sum(expr("CAST(v AS DECIMAL(38,0)) * v")).as("q2"),
          sum(expr("CAST(v AS DECIMAL(38,0)) * v * v")).as("q3"),
          sum(expr("CAST(v AS DECIMAL(38,0)) * v * v * v")).as("q4"))
        .select(col("n").as("n_days"),
          expr(s"CAST(floor($g1 * 1000.0) AS BIGINT)").as("skew_milli"),
          expr(s"CAST(floor($g2 * 1000.0) AS BIGINT)").as("exkurt_milli"),
          expr(s"CAST(floor(CAST(n AS DOUBLE) / 6.0" +
            s" * ($g1 * $g1 + $g2 * $g2 / 4.0) * 1000.0) AS BIGINT)")
            .as("jb_milli"))
    }
  }

  /** Shared oracle CTEs for the order-value regression (y = totalprice
    * cents on x = total quantity): exact n-scaled centered moments. */
  private def fitSql: String = """
    |o AS (
    |  SELECT o.o_orderkey AS id,
    |         CAST(any_value(o.o_totalprice) * 100 AS HUGEINT) AS y,
    |         sum(CAST(floor(l.l_quantity + 0.5) AS BIGINT)) AS x
    |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    |  GROUP BY 1),
    |mo AS (
    |  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
    |         sum(CAST(x AS HUGEINT) * x) AS qx,
    |         sum(CAST(x AS HUGEINT) * y) AS qxy,
    |         sum(y * y) AS qy
    |  FROM o),
    |fit AS (
    |  SELECT n, sx,
    |         CAST(n AS HUGEINT) * qx - CAST(sx AS HUGEINT) * sx AS sxx,
    |         CAST(n AS HUGEINT) * qxy - CAST(sx AS HUGEINT) * sy AS sxy,
    |         CAST(n AS HUGEINT) * qy - CAST(sy AS HUGEINT) * sy AS syy,
    |         CAST(n AS HUGEINT) * qxy - CAST(sx AS HUGEINT) * sy AS nb,
    |         CAST(sy AS HUGEINT) * qx - CAST(sx AS HUGEINT) * qxy AS na
    |  FROM mo)""".stripMargin

  private def oBase(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey").as("id"),
        expr("CAST(o_totalprice * 100 AS DECIMAL(38,0))").as("y"))
      .join(Tables.lineitem(s, dir).select(col("l_orderkey"),
        expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").as("q")),
        col("id") === col("l_orderkey"))
      .groupBy(col("id"), col("y")).agg(sum(col("q")).as("x"))

  private def fitOf(o: DataFrame): DataFrame =
    o.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("qx"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("qxy"),
        sum(col("y") * col("y")).as("qy"))
      .select(col("n"), col("sx"),
        expr("CAST(n AS DECIMAL(38,0)) * qx" +
          " - CAST(sx AS DECIMAL(38,0)) * sx").as("sxx"),
        expr("CAST(n AS DECIMAL(38,0)) * qxy" +
          " - CAST(sx AS DECIMAL(38,0)) * sy").as("sxy"),
        expr("CAST(n AS DECIMAL(38,0)) * qy" +
          " - CAST(sy AS DECIMAL(38,0)) * sy").as("syy"),
        expr("CAST(n AS DECIMAL(38,0)) * qxy" +
          " - CAST(sx AS DECIMAL(38,0)) * sy").as("nb"),
        expr("CAST(sy AS DECIMAL(38,0)) * qx" +
          " - CAST(sx AS DECIMAL(38,0)) * qxy").as("na"))

  /** Cook's-distance influence ranking of the order-value fit: per
    * order, the den-scaled exact residual r = S_xx·n·y − n·b̂x − â
    * (never divided until the report), leverage h = 1/n + c²/(n·S_xx)
    * from the integer centering, s² from the CLOSED-FORM
    * SSE = (S_yy·S_xx − S_xy²)/(n·S_xx), and D = ê²h/(2s²(1−h)²) —
    * top-10 via orderBy().limit. The "which rows own my fit" audit. */
  def q613: Q = {
    val dExpr = "(CAST(r AS DOUBLE) / CAST(sxx AS DOUBLE))" +
      " * (CAST(r AS DOUBLE) / CAST(sxx AS DOUBLE)) * h" +
      " / (2.0 * s2 * (1.0 - h) * (1.0 - h))"
    Q("q613_cooks_distance",
      Some(s"""
        |WITH ${fitSql},
        |pt AS (
        |  SELECT o.id,
        |         fit.sxx * o.y - fit.nb * o.x - fit.na AS r,
        |         1.0 / fit.n
        |           + CAST((CAST(fit.n AS HUGEINT) * o.x - fit.sx)
        |                  * (CAST(fit.n AS HUGEINT) * o.x - fit.sx)
        |                  AS DOUBLE)
        |             / (CAST(fit.n AS DOUBLE) * CAST(fit.sxx AS DOUBLE))
        |           AS h,
        |         (CAST(fit.syy AS DOUBLE) - CAST(fit.sxy AS DOUBLE)
        |            * CAST(fit.sxy AS DOUBLE) / CAST(fit.sxx AS DOUBLE))
        |           / CAST(fit.n AS DOUBLE) / (fit.n - 2) AS s2,
        |         fit.sxx AS sxx
        |  FROM o CROSS JOIN fit)
        |SELECT CAST(id AS BIGINT) AS id,
        |       CAST(floor($dExpr * 1000000.0) AS BIGINT) AS d_micro,
        |       CAST(floor(h * 1000000.0) AS BIGINT) AS leverage_micro,
        |       CAST(floor(CAST(r AS DOUBLE) / CAST(sxx AS DOUBLE))
        |         AS BIGINT) AS resid_cents
        |FROM pt ORDER BY $dExpr DESC, id LIMIT 10
        |""".stripMargin)) { (s, dir) =>
      val o = oBase(s, dir).materialize()
      val fit = fitOf(o)
      val pt = o.crossJoin(broadcast(fit))
        .select(col("id"),
          (col("sxx") * col("y") - col("nb") * col("x") - col("na"))
            .as("r"),
          expr("1.0 / n + CAST((CAST(n AS DECIMAL(38,0)) * x - sx)" +
            " * (CAST(n AS DECIMAL(38,0)) * x - sx) AS DOUBLE)" +
            " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE))").as("h"),
          expr("(CAST(syy AS DOUBLE) - CAST(sxy AS DOUBLE)" +
            " * CAST(sxy AS DOUBLE) / CAST(sxx AS DOUBLE))" +
            " / CAST(n AS DOUBLE) / (n - 2)").as("s2"),
          col("sxx"))
      pt.withColumn("dd", expr(dExpr))
        .orderBy(col("dd").desc, col("id"))
        .limit(10)
        .select(col("id"),
          expr(s"CAST(floor($dExpr * 1000000.0) AS BIGINT)")
            .as("d_micro"),
          expr("CAST(floor(h * 1000000.0) AS BIGINT)")
            .as("leverage_micro"),
          expr("CAST(floor(CAST(r AS DOUBLE) / CAST(sxx AS DOUBLE))" +
            " AS BIGINT)").as("resid_cents"))
    }
  }

  /** Goldfeld–Quandt heteroscedasticity test: split orders into the
    * low and high thirds by x (exact order-statistic cutoffs), fit
    * each third separately, and compare the CLOSED-FORM residual
    * variances F = s²_hi / s²_lo. Avoids per-row squared residuals
    * entirely — both SSEs are (S_yy·S_xx − S_xy²)/(n·S_xx) in exact
    * HUGEINT. */
  def q614: Q = {
    def sseSql(a: String) =
      s"(CAST($a.syy AS DOUBLE) - CAST($a.sxy AS DOUBLE)" +
        s" * CAST($a.sxy AS DOUBLE) / CAST($a.sxx AS DOUBLE))" +
        s" / CAST($a.n AS DOUBLE) / ($a.n - 2)"
    Q("q614_goldfeld_quandt",
      Some(s"""
        |WITH o0 AS (
        |  SELECT o.o_orderkey AS id,
        |         CAST(any_value(o.o_totalprice) * 100 AS HUGEINT) AS y,
        |         sum(CAST(floor(l.l_quantity + 0.5) AS BIGINT)) AS x
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |  GROUP BY 1),
        |rk AS (SELECT id, y, x,
        |              row_number() OVER (ORDER BY x, id) AS rn,
        |              count(*) OVER () AS nn FROM o0),
        |lo AS (SELECT * FROM rk WHERE rn <= nn // 3),
        |hi AS (SELECT * FROM rk WHERE rn > nn - nn // 3),
        |flo AS (
        |  SELECT count(*) AS n,
        |         CAST(count(*) AS HUGEINT) * sum(CAST(x AS HUGEINT) * x)
        |           - CAST(sum(x) AS HUGEINT) * sum(x) AS sxx,
        |         CAST(count(*) AS HUGEINT) * sum(CAST(x AS HUGEINT) * y)
        |           - CAST(sum(x) AS HUGEINT) * sum(y) AS sxy,
        |         CAST(count(*) AS HUGEINT) * sum(y * y)
        |           - CAST(sum(y) AS HUGEINT) * sum(y) AS syy
        |  FROM lo),
        |fhi AS (
        |  SELECT count(*) AS n,
        |         CAST(count(*) AS HUGEINT) * sum(CAST(x AS HUGEINT) * x)
        |           - CAST(sum(x) AS HUGEINT) * sum(x) AS sxx,
        |         CAST(count(*) AS HUGEINT) * sum(CAST(x AS HUGEINT) * y)
        |           - CAST(sum(x) AS HUGEINT) * sum(y) AS sxy,
        |         CAST(count(*) AS HUGEINT) * sum(y * y)
        |           - CAST(sum(y) AS HUGEINT) * sum(y) AS syy
        |  FROM hi)
        |SELECT CAST(flo.n AS BIGINT) AS n_low,
        |       CAST(fhi.n AS BIGINT) AS n_high,
        |       CAST(floor(${sseSql("fhi")} / (${sseSql("flo")})
        |         * 1000.0) AS BIGINT) AS f_milli
        |FROM flo CROSS JOIN fhi
        |""".stripMargin)) { (s, dir) =>
      val o = oBase(s, dir).materialize()
      val n = o.count()
      val third = n / 3
      // thirds by exact rank over x — bucket-parallel (x div 8 is a
      // monotone coarse prefix; x is total order quantity ≤ ~350)
      val rk = graft.dedup.SortedNeighborhood.globalRankCum(
          o.withColumn("__bkt", expr("x div 8")),
          idCol = "id", bucketCol = "__bkt", tieCols = Seq("x"))
        .materialize()
      def fitP(df: DataFrame) =
        df.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(col("y")).as("sy"),
            sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("qx"),
            sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("qxy"),
            sum(col("y") * col("y")).as("qy"))
          .select(col("n"),
            expr("CAST(n AS DECIMAL(38,0)) * qx" +
              " - CAST(sx AS DECIMAL(38,0)) * sx").as("sxx"),
            expr("CAST(n AS DECIMAL(38,0)) * qxy" +
              " - CAST(sx AS DECIMAL(38,0)) * sy").as("sxy"),
            expr("CAST(n AS DECIMAL(38,0)) * qy" +
              " - CAST(sy AS DECIMAL(38,0)) * sy").as("syy"))
      val flo = fitP(rk.where(col("__rank") <= third))
        .select(col("n").as("ln"), col("sxx").as("lsxx"),
          col("sxy").as("lsxy"), col("syy").as("lsyy"))
      val fhi = fitP(rk.where(col("__rank") > n - third))
      val sseHi = "(CAST(syy AS DOUBLE) - CAST(sxy AS DOUBLE)" +
        " * CAST(sxy AS DOUBLE) / CAST(sxx AS DOUBLE))" +
        " / CAST(n AS DOUBLE) / (n - 2)"
      val sseLo = "(CAST(lsyy AS DOUBLE) - CAST(lsxy AS DOUBLE)" +
        " * CAST(lsxy AS DOUBLE) / CAST(lsxx AS DOUBLE))" +
        " / CAST(ln AS DOUBLE) / (ln - 2)"
      fhi.crossJoin(broadcast(flo))
        .select(col("ln").as("n_low"), col("n").as("n_high"),
          expr(s"CAST(floor($sseHi / ($sseLo) * 1000.0) AS BIGINT)")
            .as("f_milli"))
    }
  }

  /** Bartlett's test for equal price variance across brands: exact
    * per-brand variance rationals, ln terms quantized to DECIMAL(18,9)
    * (the established ln discipline) before the exact decimal sums,
    * correction factor C from pinned rationals. The pooled-variance
    * gate an ANOVA assumes — run it BEFORE trusting q471's F. */
  def q615: Q = {
    val s2g = "CAST(CAST(ng AS HUGEINT) * qg - CAST(sg AS HUGEINT) * sg" +
      " AS DOUBLE) / (CAST(ng AS DOUBLE) * (ng - 1))"
    val s2gSpark = s2g.replace("HUGEINT", "DECIMAL(38,0)")
    Q("q615_bartlett_brands",
      Some(s"""
        |WITH x AS (
        |  SELECT p_brand AS g,
        |         CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS c
        |  FROM part),
        |gs AS (
        |  SELECT g, count(*) AS ng, sum(c) AS sg,
        |         sum(CAST(c AS HUGEINT) * c) AS qg
        |  FROM x GROUP BY 1 HAVING count(*) >= 2),
        |lt AS (
        |  SELECT g, ng,
        |         CAST((ng - 1) AS DECIMAL(18,0))
        |           * CAST(ln($s2g) AS DECIMAL(18,9)) AS term,
        |         $s2g AS s2, ng - 1 AS df
        |  FROM gs),
        |ag AS (
        |  SELECT count(*) AS k, sum(ng) AS nn, sum(df) AS dfsum,
        |         sum(term) AS lsum,
        |         sum(CAST(s2 * (ng - 1) AS DECIMAL(28,6))) AS pool_num,
        |         sum(CAST(1.0 / df AS DECIMAL(18,9))) AS invdf
        |  FROM lt)
        |SELECT CAST(k AS BIGINT) AS k_brands, CAST(nn AS BIGINT) AS n_parts,
        |       CAST(floor((CAST(dfsum AS DOUBLE)
        |           * ln(CAST(pool_num AS DOUBLE) / CAST(dfsum AS DOUBLE))
        |           - CAST(lsum AS DOUBLE))
        |         / (1.0 + (CAST(invdf AS DOUBLE) - 1.0 / dfsum)
        |            / (3.0 * (k - 1)))
        |         * 1000.0) AS BIGINT) AS bartlett_milli
        |FROM ag
        |""".stripMargin)) { (s, dir) =>
      val gs = Tables.part(s, dir)
        .select(col("p_brand").as("g"),
          expr("CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)").as("c"))
        .groupBy(col("g"))
        .agg(count(lit(1)).as("ng"), sum(col("c")).as("sg"),
          sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("qg"))
        .where(col("ng") >= 2)
      val lt = gs.select(col("g"), col("ng"),
        expr(s"CAST((ng - 1) AS DECIMAL(18,0))" +
          s" * CAST(ln($s2gSpark) AS DECIMAL(18,9))").as("term"),
        expr(s2gSpark).as("s2"), (col("ng") - 1).as("df"))
      lt.agg(count(lit(1)).as("k"), sum(col("ng")).as("nn"),
          sum(col("df")).as("dfsum"), sum(col("term")).as("lsum"),
          sum(expr("CAST(s2 * (ng - 1) AS DECIMAL(28,6))"))
            .as("pool_num"),
          sum(expr("CAST(1.0 / df AS DECIMAL(18,9))")).as("invdf"))
        .select(col("k").as("k_brands"), col("nn").as("n_parts"),
          expr("CAST(floor((CAST(dfsum AS DOUBLE)" +
            " * ln(CAST(pool_num AS DOUBLE) / CAST(dfsum AS DOUBLE))" +
            " - CAST(lsum AS DOUBLE))" +
            " / (1.0 + (CAST(invdf AS DOUBLE) - 1.0 / dfsum)" +
            " / (3.0 * (k - 1)))" +
            " * 1000.0) AS BIGINT)").as("bartlett_milli"))
    }
  }
}
