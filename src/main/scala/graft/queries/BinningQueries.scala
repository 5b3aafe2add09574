package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Materialize.MatOps
import graft.Tables

/** Round-9 histogram/KDE bin-selection wave on order values: the
  * Freedman-Diaconis rule, the Sturges/Scott/Rice selector
  * comparison, Silverman's KDE bandwidth, a Gaussian KDE evaluated at
  * the exact ECDF deciles, and an equal-width 10-bin uniformity audit
  * (χ² + histogram entropy).
  *
  * Scale: all selectors are one exact-moment fact pass (n, Σv, Σv²,
  * min/max) plus ECDF quartile cuts from the value-histogram cum; the
  * KDE is a second fact pass against a 5-row broadcast of evaluation
  * points with per-term DECIMAL(18,9) kernel quantization before the
  * exact sum (the bandwidth is a pinned double chain from exact
  * integers, recomputed identically inside each term). */
object BinningQueries {

  val all: Seq[Q] = Seq(q851, q852, q853, q854, q855)

  private def sqlBase: String = """
    |x AS (SELECT CAST(o_totalprice * 100 AS BIGINT) AS v FROM orders),
    |gl AS (SELECT count(*) AS n, sum(CAST(v AS HUGEINT)) AS s,
    |              sum(CAST(v AS HUGEINT) * v) AS q,
    |              min(v) AS mn, max(v) AS mx FROM x),
    |vc AS (SELECT v AS val, sum(cnt) OVER (ORDER BY v) AS cum FROM
    |  (SELECT v, count(*) AS cnt FROM x GROUP BY 1)),
    |q1 AS (SELECT min(val) AS q FROM vc CROSS JOIN gl
    |       WHERE 4 * cum >= gl.n),
    |q3 AS (SELECT min(val) AS q FROM vc CROSS JOIN gl
    |       WHERE 4 * cum >= 3 * gl.n)""".stripMargin

  /** Spark (gl, q1, q3) scalar frames. */
  private def statBase(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val x = Tables.orders(s, dir)
      .select(expr("CAST(CAST(o_totalprice * 100 AS DECIMAL(38,0))" +
        " AS LONG)").as("v")).materialize()
    val gl = x.select(col("v").cast("decimal(38,0)").as("vd"), col("v"))
      .agg(count(lit(1)).as("n"), sum(col("vd")).as("s"),
        sum(col("vd") * col("vd")).as("q"), min(col("v")).as("mn"),
        max(col("v")).as("mx"))
    val vc = x.groupBy(col("v").as("val")).agg(count(lit(1)).as("cnt"))
      .select(col("val"),
        sum(col("cnt")).over(Window.orderBy(col("val"))).as("cum"))
      .crossJoin(broadcast(x.agg(count(lit(1)).as("n2"))))
      .materialize()
    val q1 = vc.where(col("cum") * 4 >= col("n2"))
      .agg(min(col("val")).as("q1v"))
    val q3 = vc.where(col("cum") * 4 >= col("n2") * 3)
      .agg(min(col("val")).as("q3v"))
    (x, gl, q1, q3)
  }

  private def sdSql(pfx: String = ""): String =
    s"sqrt(CAST(${pfx}n * ${pfx}q - ${pfx}s * ${pfx}s AS DOUBLE)" +
      s" / (CAST(${pfx}n AS DOUBLE) * (${pfx}n - 1)))"

  /** Freedman-Diaconis: width 2·IQR·n^(−1/3) and the implied bins. */
  def q851: Q = Q(
    "q851_freedman_diaconis",
    Some(s"""
      |WITH ${sqlBase}
      |SELECT CAST(gl.n AS BIGINT) AS n,
      |       CAST(q3.q - q1.q AS BIGINT) AS iqr_cents,
      |       CAST(floor(2.0 * (q3.q - q1.q)
      |            / pow(CAST(gl.n AS DOUBLE), CAST(1 AS DOUBLE) / 3)) AS BIGINT)
      |         AS fd_width_cents,
      |       CAST(ceil((gl.mx - gl.mn) / floor(2.0 * (q3.q - q1.q)
      |            / pow(CAST(gl.n AS DOUBLE), CAST(1 AS DOUBLE) / 3))) AS BIGINT)
      |         AS fd_bins
      |FROM gl CROSS JOIN q1 CROSS JOIN q3
      |""".stripMargin)) { (s, dir) =>
    val (_, gl, q1, q3) = statBase(s, dir)
    gl.crossJoin(broadcast(q1)).crossJoin(broadcast(q3))
      .select(col("n").cast("long").as("n"),
        (col("q3v") - col("q1v")).cast("long").as("iqr_cents"),
        expr("""CAST(floor(2.0 * (q3v - q1v)
          |  / pow(CAST(n AS DOUBLE), CAST(1 AS DOUBLE) / 3)) AS BIGINT)"""
          .stripMargin).as("fd_width_cents"),
        expr("""CAST(ceil((mx - mn) / floor(2.0 * (q3v - q1v)
          |  / pow(CAST(n AS DOUBLE), CAST(1 AS DOUBLE) / 3))) AS BIGINT)"""
          .stripMargin).as("fd_bins"))
  }

  /** Sturges vs Rice vs Scott: the classic bin-count trio. */
  def q852: Q = Q(
    "q852_bin_selector_trio",
    Some(s"""
      |WITH ${sqlBase}
      |SELECT CAST(ceil(ln(CAST(gl.n AS DOUBLE)) / ln(2.0)) + 1
      |            AS BIGINT) AS sturges_bins,
      |       CAST(ceil(2.0 * pow(CAST(gl.n AS DOUBLE), CAST(1 AS DOUBLE) / 3))
      |            AS BIGINT) AS rice_bins,
      |       CAST(floor(3.49 * ${sdSql("gl.")}
      |            / pow(CAST(gl.n AS DOUBLE), CAST(1 AS DOUBLE) / 3)) AS BIGINT)
      |         AS scott_width_cents
      |FROM gl
      |""".stripMargin)) { (s, dir) =>
    val (_, gl, _, _) = statBase(s, dir)
    gl.select(
      expr("CAST(ceil(ln(CAST(n AS DOUBLE)) / ln(2.0)) + 1 AS BIGINT)")
        .as("sturges_bins"),
      expr("CAST(ceil(2.0 * pow(CAST(n AS DOUBLE), CAST(1 AS DOUBLE) / 3)) AS BIGINT)")
        .as("rice_bins"),
      expr(s"""CAST(floor(3.49 * ${sdSql()}
        |  / pow(CAST(n AS DOUBLE), CAST(1 AS DOUBLE) / 3)) AS BIGINT)""".stripMargin)
        .as("scott_width_cents"))
  }

  /** Silverman's rule-of-thumb KDE bandwidth
    * 0.9·min(σ, IQR/1.34)·n^(−1/5). */
  def q853: Q = Q(
    "q853_silverman_bandwidth",
    Some(s"""
      |WITH ${sqlBase}
      |SELECT CAST(gl.n AS BIGINT) AS n,
      |       CAST(floor(0.9 * least(${sdSql("gl.")},
      |            (q3.q - q1.q) / 1.34)
      |            / pow(CAST(gl.n AS DOUBLE), 0.2)) AS BIGINT)
      |         AS silverman_h_cents
      |FROM gl CROSS JOIN q1 CROSS JOIN q3
      |""".stripMargin)) { (s, dir) =>
    val (_, gl, q1, q3) = statBase(s, dir)
    gl.crossJoin(broadcast(q1)).crossJoin(broadcast(q3))
      .select(col("n").cast("long").as("n"),
        expr(s"""CAST(floor(0.9 * least(${sdSql()}, (q3v - q1v) / 1.34)
          |  / pow(CAST(n AS DOUBLE), 0.2)) AS BIGINT)""".stripMargin)
          .as("silverman_h_cents"))
  }

  /** Gaussian KDE at the exact ECDF deciles {10,30,50,70,90}%:
    * per-term exp(−z²/2) quantized to DECIMAL(18,9), exact sum,
    * density reported ×10¹². */
  def q854: Q = Q(
    "q854_gaussian_kde_deciles",
    Some(s"""
      |WITH ${sqlBase},
      |pp AS (SELECT * FROM (VALUES (100),(300),(500),(700),(900))
      |       AS t(p)),
      |ev AS (SELECT pp.p, min(val) AS e FROM pp CROSS JOIN gl
      |       JOIN vc ON 10 * vc.cum >= (pp.p // 100) * gl.n GROUP BY 1),
      |hb AS (SELECT 0.9 * least(${sdSql("gl.")}, (q3.q - q1.q) / 1.34)
      |              / pow(CAST(gl.n AS DOUBLE), 0.2) AS h, gl.n
      |       FROM gl CROSS JOIN q1 CROSS JOIN q3),
      |kt AS (
      |  SELECT ev.p, ev.e, hb.h, hb.n,
      |         sum(CAST(exp(-((x.v - ev.e) / hb.h)
      |                      * ((x.v - ev.e) / hb.h) / 2.0)
      |             AS DECIMAL(18,9))) AS sk
      |  FROM x CROSS JOIN hb JOIN ev ON 1 = 1
      |  GROUP BY 1, 2, 3, 4)
      |SELECT CAST(p AS BIGINT) AS p_permille,
      |       CAST(e AS BIGINT) AS eval_cents,
      |       CAST(floor(1e12 * CAST(sk AS DOUBLE)
      |            / (n * h * sqrt(2.0 * pi()))) AS BIGINT)
      |         AS density_e12
      |FROM kt ORDER BY p_permille
      |""".stripMargin)) { (s, dir) =>
    val (x, gl, q1, q3) = statBase(s, dir)
    val pp = s.createDataFrame(Seq(100, 300, 500, 700, 900).map(Tuple1(_)))
      .toDF("p")
    val vc = x.groupBy(col("v").as("val")).agg(count(lit(1)).as("cnt"))
      .select(col("val"),
        sum(col("cnt")).over(Window.orderBy(col("val"))).as("cum"))
    val ev = broadcast(pp).crossJoin(broadcast(gl.select(col("n"))))
      .join(vc, col("cum") * 10 >= expr("(p div 100) * n"))
      .groupBy(col("p")).agg(min(col("val")).as("e"))
    val hb = gl.crossJoin(broadcast(q1)).crossJoin(broadcast(q3))
      .select(expr(s"""0.9 * least(${sdSql()}, (q3v - q1v) / 1.34)
        |  / pow(CAST(n AS DOUBLE), 0.2)""".stripMargin).as("h"),
        col("n"))
    x.crossJoin(broadcast(hb)).join(broadcast(ev), lit(true))
      .groupBy(col("p"), col("e"), col("h"), col("n"))
      .agg(sum(expr("""CAST(exp(-((v - e) / h) * ((v - e) / h) / 2.0)
        |  AS DECIMAL(18,9))""".stripMargin)).as("sk"))
      .select(col("p").cast("long").as("p_permille"),
        col("e").cast("long").as("eval_cents"),
        expr("""CAST(floor(1e12 * CAST(sk AS DOUBLE)
          |  / (n * h * sqrt(2.0 * pi()))) AS BIGINT)""".stripMargin)
          .as("density_e12"))
      .orderBy(col("p_permille"))
  }

  /** Equal-width 10-bin uniformity audit: χ² against uniform
    * (per-bin integer milli terms) and the histogram entropy. */
  def q855: Q = Q(
    "q855_histogram_uniformity",
    Some(s"""
      |WITH ${sqlBase},
      |hb AS (SELECT least(9, ((x.v - gl.mn) * 10) // (gl.mx - gl.mn + 1))
      |         AS b
      |       FROM x CROSS JOIN gl),
      |oc AS (SELECT b, count(*) AS obs FROM hb GROUP BY 1),
      |ct AS (SELECT oc.b, oc.obs,
      |              (1000 * (10 * oc.obs - gl.n) * (10 * oc.obs - gl.n))
      |                // (10 * gl.n) AS term,
      |              CAST(-(CAST(oc.obs AS DOUBLE) / gl.n)
      |                   * ln(CAST(oc.obs AS DOUBLE) / gl.n)
      |                   AS DECIMAL(18,9)) AS ent
      |       FROM oc CROSS JOIN gl)
      |SELECT CAST(count(*) AS BIGINT) AS n_bins,
      |       CAST(sum(term) AS BIGINT) AS chi2_milli,
      |       CAST(floor(1000.0 * CAST(sum(ent) AS DOUBLE)) AS BIGINT)
      |         AS entropy_milli,
      |       CAST(max(obs) AS BIGINT) AS max_bin_count,
      |       CAST(min(obs) AS BIGINT) AS min_bin_count
      |FROM ct
      |""".stripMargin)) { (s, dir) =>
    val (x, gl, _, _) = statBase(s, dir)
    val oc = x.crossJoin(broadcast(gl))
      .select(least(lit(9),
        expr("((v - mn) * 10) div (mx - mn + 1)")).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("obs"))
    oc.crossJoin(broadcast(gl))
      .select(col("obs"),
        expr("""(1000 * (10 * obs - n) * (10 * obs - n)) div (10 * n)""")
          .as("term"),
        expr("""CAST(-(CAST(obs AS DOUBLE) / n)
          |  * ln(CAST(obs AS DOUBLE) / n) AS DECIMAL(18,9))"""
          .stripMargin).as("ent"))
      .agg(count(lit(1)).as("nb"), sum(col("term")).as("chi2"),
        sum(col("ent")).as("se"), max(col("obs")).as("mb"),
        min(col("obs")).as("nbm"))
      .select(col("nb").cast("long").as("n_bins"),
        col("chi2").cast("long").as("chi2_milli"),
        expr("CAST(floor(1000.0 * CAST(se AS DOUBLE)) AS BIGINT)")
          .as("entropy_milli"),
        col("mb").cast("long").as("max_bin_count"),
        col("nbm").cast("long").as("min_bin_count"))
  }
}
