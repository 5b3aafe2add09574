package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-11 panel-econometrics wave on the (customer-nation ×
  * order-year) panel — cells carry x = order count and y = exact
  * order-value cents: pooled OLS, the within (fixed-effects)
  * estimator, the between estimator, a Chow break test at 1995, and
  * White-HC0 vs classical standard errors.
  *
  * Exactness: the panel is restricted to the BALANCED sub-panel
  * (nations with the modal year count T, stated) so within-demeaning
  * needs no per-nation division — Σᵢ Sxᵢ·Syᵢ/nᵢ = (Σᵢ Sxᵢ·Syᵢ)/T
  * with the numerator an exact DECIMAL sum of integer products; all
  * other moments are DECIMAL(19,0)²-in-(38,0) sums; HC0 residuals
  * are cent-floored from the shared-text fitted line before the
  * exact Σe²·(n·x−Σx)² sum (HUGEINT ≡ chained DECIMAL). Every
  * estimator finishes in one shared double step.
  *
  * Scale: ONE orders⋈customer pass aggregates to ≤ 25×7 cells;
  * everything after is cell-dim algebra. */
object PanelRegQueries {

  val all: Seq[Q] = Seq(q1156, q1157, q1158, q1159, q1160)

  /** Oracle balanced panel pn(i, t, x, y) + tmax(tt). */
  private def sqlPn: String = """
    |cell AS (SELECT c.c_nationkey AS i,
    |           year(CAST(o.o_orderdate AS DATE)) AS t,
    |           count(*) AS x,
    |           sum(CAST(o.o_totalprice * 100 AS BIGINT)) AS y
    |         FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    |         GROUP BY 1, 2),
    |tmax AS (SELECT max(cnt) AS tt FROM
    |          (SELECT i, count(*) AS cnt FROM cell GROUP BY 1) q),
    |bal AS (SELECT i FROM cell GROUP BY 1
    |        HAVING count(*) = (SELECT tt FROM tmax)),
    |pn AS (SELECT cell.i, cell.t, cell.x, cell.y
    |       FROM cell JOIN bal ON bal.i = cell.i)""".stripMargin

  /** Oracle pooled moments mo(n, sx, sy, sxx, sxy, syy). */
  private def sqlMo: String = """
    |mo AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
    |         sum(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
    |           AS sxx,
    |         sum(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
    |           AS sxy,
    |         sum(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
    |           AS syy
    |       FROM pn)""".stripMargin

  /** Spark twin of [[sqlPn]] — the (nation, year) cell frame is ONE
    * orders⋈customer pass, SpineCache-backed for the wave. */
  private def pn(s: SparkSession, dir: String): DataFrame = {
    val cell = graft.sources.SpineCache.table(s, dir,
      "nation_year_cells", Seq("orders", "customer")) {
      Tables.orders(s, dir)
        .select(col("o_custkey").as("ck"),
          year(col("o_orderdate").cast("date")).as("t"),
          expr("CAST(CAST(o_totalprice * 100 AS DECIMAL(38,0)) AS LONG)")
            .as("v"))
        .join(Tables.customer(s, dir)
          .select(col("c_custkey").as("ck"), col("c_nationkey").as("i")),
          "ck")
        .groupBy(col("i"), col("t"))
        .agg(count(lit(1)).as("x"), sum(col("v")).as("y"))
    }
    val tmax = cell.groupBy(col("i")).agg(count(lit(1)).as("cnt"))
      .agg(max(col("cnt")).as("tt"))
    val bal = cell.groupBy(col("i")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(tmax))
      .where(col("cnt") === col("tt"))
      .select(col("i").as("ib"))
    cell.join(broadcast(bal), col("i") === col("ib"))
      .select(col("i"), col("t"), col("x"), col("y"))
  }

  /** Spark pooled moments over the balanced panel. */
  private def mo(s: SparkSession, dir: String): DataFrame =
    pn(s, dir).agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("y")).as("sy"),
      expr("sum(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))")
        .as("sxx"),
      expr("sum(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))")
        .as("sxy"),
      expr("sum(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))")
        .as("syy"))

  private def sxxc = "(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)" +
    " * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))"
  private def sxyc = "(CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)" +
    " * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))"
  private def syyc = "(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)" +
    " * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))"

  /** Pooled OLS of cell value on cell order count. */
  def q1156: Q = {
    val b = s"($sxyc / $sxxc)"
    val se = s"(sqrt(($syyc - $b * $b * $sxxc)" +
      s" / (CAST(n AS DOUBLE) - 2.0) / $sxxc))"
    val r2 = s"($sxyc * $sxyc / ($sxxc * $syyc))"
    Q("q1156_pooled_ols",
      Some(s"""
        |WITH ${sqlPn},
        |${sqlMo}
        |SELECT CAST(n AS BIGINT) AS n_cells,
        |       CAST(floor($b) AS BIGINT) AS slope_cents_per_order,
        |       CAST(floor($se) AS BIGINT) AS se_cents,
        |       CAST(floor(1000.0 * $r2) AS BIGINT) AS r2_milli
        |FROM mo
        |""".stripMargin)) { (s, dir) =>
      mo(s, dir)
        .select(col("n").cast("long").as("n_cells"),
          expr(s"CAST(floor($b) AS BIGINT)").as("slope_cents_per_order"),
          expr(s"CAST(floor($se) AS BIGINT)").as("se_cents"),
          expr(s"CAST(floor(1000.0 * $r2) AS BIGINT)").as("r2_milli"))
    }
  }

  /** Within (fixed-effects) estimator on the balanced panel:
    * W_xy = Σxy − (Σᵢ Sxᵢ·Syᵢ)/T etc; slope, SE (dof n−N−1), and
    * the nation-effect share of raw variance. */
  def q1157: Q = {
    val wxx = "(CAST(sxx AS DOUBLE) - CAST(pxx AS DOUBLE)" +
      " / CAST(tt AS DOUBLE))"
    val wxy = "(CAST(sxy AS DOUBLE) - CAST(pxy AS DOUBLE)" +
      " / CAST(tt AS DOUBLE))"
    val wyy = "(CAST(syy AS DOUBLE) - CAST(pyy AS DOUBLE)" +
      " / CAST(tt AS DOUBLE))"
    val b = s"($wxy / $wxx)"
    val se = s"(sqrt(($wyy - $b * $b * $wxx)" +
      " / (CAST(n AS DOUBLE) - CAST(nn AS DOUBLE) - 1.0)" +
      s" / $wxx))"
    val share = s"(1.0 - $wyy / $syyc)"
    Q("q1157_within_estimator",
      Some(s"""
        |WITH ${sqlPn},
        |${sqlMo},
        |pi AS (SELECT i, sum(x) AS sxi, sum(y) AS syi FROM pn
        |       GROUP BY 1),
        |pp AS (SELECT count(*) AS nn,
        |         sum(CAST(sxi AS DECIMAL(19,0)) * CAST(sxi AS DECIMAL(19,0)))
        |           AS pxx,
        |         sum(CAST(sxi AS DECIMAL(19,0)) * CAST(syi AS DECIMAL(19,0)))
        |           AS pxy,
        |         sum(CAST(syi AS DECIMAL(19,0)) * CAST(syi AS DECIMAL(19,0)))
        |           AS pyy
        |       FROM pi)
        |SELECT CAST(n AS BIGINT) AS n_cells,
        |       CAST(nn AS BIGINT) AS n_nations,
        |       CAST(floor($b) AS BIGINT) AS fe_slope_cents_per_order,
        |       CAST(floor($se) AS BIGINT) AS fe_se_cents,
        |       CAST(floor(1000.0 * $share) AS BIGINT)
        |         AS nation_effect_share_milli
        |FROM mo CROSS JOIN pp CROSS JOIN tmax
        |""".stripMargin)) { (s, dir) =>
      val p = pn(s, dir)
      val m = mo(s, dir)
      val pi = p.groupBy(col("i"))
        .agg(sum(col("x")).as("sxi"), sum(col("y")).as("syi"))
      val pp = pi.agg(count(lit(1)).as("nn"),
        expr("sum(CAST(sxi AS DECIMAL(19,0)) * CAST(sxi AS DECIMAL(19,0)))")
          .as("pxx"),
        expr("sum(CAST(sxi AS DECIMAL(19,0)) * CAST(syi AS DECIMAL(19,0)))")
          .as("pxy"),
        expr("sum(CAST(syi AS DECIMAL(19,0)) * CAST(syi AS DECIMAL(19,0)))")
          .as("pyy"))
      val tmax = p.groupBy(col("i")).agg(count(lit(1)).as("cnt"))
        .agg(max(col("cnt")).as("tt"))
      m.crossJoin(broadcast(pp)).crossJoin(broadcast(tmax))
        .select(col("n").cast("long").as("n_cells"),
          col("nn").cast("long").as("n_nations"),
          expr(s"CAST(floor($b) AS BIGINT)")
            .as("fe_slope_cents_per_order"),
          expr(s"CAST(floor($se) AS BIGINT)").as("fe_se_cents"),
          expr(s"CAST(floor(1000.0 * $share) AS BIGINT)")
            .as("nation_effect_share_milli"))
    }
  }

  /** Between estimator (regression across nation sums — slope equals
    * the means regression on the balanced panel) and its contrast
    * with the within slope. */
  def q1158: Q = {
    val bxx = "(CAST(pxx AS DOUBLE) - CAST(psx AS DOUBLE)" +
      " * CAST(psx AS DOUBLE) / CAST(nn AS DOUBLE))"
    val bxy = "(CAST(pxy AS DOUBLE) - CAST(psx AS DOUBLE)" +
      " * CAST(psy AS DOUBLE) / CAST(nn AS DOUBLE))"
    val byy = "(CAST(pyy AS DOUBLE) - CAST(psy AS DOUBLE)" +
      " * CAST(psy AS DOUBLE) / CAST(nn AS DOUBLE))"
    val bb = s"($bxy / $bxx)"
    val r2b = s"($bxy * $bxy / ($bxx * $byy))"
    val wxx = "(CAST(sxx AS DOUBLE) - CAST(pxx AS DOUBLE)" +
      " / CAST(tt AS DOUBLE))"
    val wxy = "(CAST(sxy AS DOUBLE) - CAST(pxy AS DOUBLE)" +
      " / CAST(tt AS DOUBLE))"
    val bw = s"($wxy / $wxx)"
    Q("q1158_between_estimator",
      Some(s"""
        |WITH ${sqlPn},
        |${sqlMo},
        |pi AS (SELECT i, sum(x) AS sxi, sum(y) AS syi FROM pn
        |       GROUP BY 1),
        |pp AS (SELECT count(*) AS nn, sum(sxi) AS psx, sum(syi) AS psy,
        |         sum(CAST(sxi AS DECIMAL(19,0)) * CAST(sxi AS DECIMAL(19,0)))
        |           AS pxx,
        |         sum(CAST(sxi AS DECIMAL(19,0)) * CAST(syi AS DECIMAL(19,0)))
        |           AS pxy,
        |         sum(CAST(syi AS DECIMAL(19,0)) * CAST(syi AS DECIMAL(19,0)))
        |           AS pyy
        |       FROM pi)
        |SELECT CAST(nn AS BIGINT) AS n_nations,
        |       CAST(floor($bb) AS BIGINT) AS be_slope_cents_per_order,
        |       CAST(floor(1000.0 * $r2b) AS BIGINT) AS be_r2_milli,
        |       CAST(floor(1000.0 * $bb / $bw) AS BIGINT)
        |         AS between_over_within_milli
        |FROM mo CROSS JOIN pp CROSS JOIN tmax
        |""".stripMargin)) { (s, dir) =>
      val p = pn(s, dir)
      val m = mo(s, dir)
      val pi = p.groupBy(col("i"))
        .agg(sum(col("x")).as("sxi"), sum(col("y")).as("syi"))
      val pp = pi.agg(count(lit(1)).as("nn"), sum(col("sxi")).as("psx"),
        sum(col("syi")).as("psy"),
        expr("sum(CAST(sxi AS DECIMAL(19,0)) * CAST(sxi AS DECIMAL(19,0)))")
          .as("pxx"),
        expr("sum(CAST(sxi AS DECIMAL(19,0)) * CAST(syi AS DECIMAL(19,0)))")
          .as("pxy"),
        expr("sum(CAST(syi AS DECIMAL(19,0)) * CAST(syi AS DECIMAL(19,0)))")
          .as("pyy"))
      val tmax = p.groupBy(col("i")).agg(count(lit(1)).as("cnt"))
        .agg(max(col("cnt")).as("tt"))
      m.crossJoin(broadcast(pp)).crossJoin(broadcast(tmax))
        .select(col("nn").cast("long").as("n_nations"),
          expr(s"CAST(floor($bb) AS BIGINT)")
            .as("be_slope_cents_per_order"),
          expr(s"CAST(floor(1000.0 * $r2b) AS BIGINT)").as("be_r2_milli"),
          expr(s"CAST(floor(1000.0 * $bb / $bw) AS BIGINT)")
            .as("between_over_within_milli"))
    }
  }

  /** Chow break test at 1995 on the pooled cell regression:
    * F = ((SSRp − SSR1 − SSR2)/2) / ((SSR1 + SSR2)/(n − 4)). */
  def q1159: Q = {
    def ssr(p: String) = s"((CAST(${p}syy AS DOUBLE) - CAST(${p}sy AS DOUBLE)" +
      s" * CAST(${p}sy AS DOUBLE) / CAST(${p}n AS DOUBLE))" +
      s" - (CAST(${p}sxy AS DOUBLE) - CAST(${p}sx AS DOUBLE)" +
      s" * CAST(${p}sy AS DOUBLE) / CAST(${p}n AS DOUBLE))" +
      s" * (CAST(${p}sxy AS DOUBLE) - CAST(${p}sx AS DOUBLE)" +
      s" * CAST(${p}sy AS DOUBLE) / CAST(${p}n AS DOUBLE))" +
      s" / (CAST(${p}sxx AS DOUBLE) - CAST(${p}sx AS DOUBLE)" +
      s" * CAST(${p}sx AS DOUBLE) / CAST(${p}n AS DOUBLE)))"
    val f = s"(((${ssr("")} - ${ssr("a")} - ${ssr("b")}) / 2.0)" +
      s" / ((${ssr("a")} + ${ssr("b")})" +
      " / (CAST(n AS DOUBLE) - 4.0)))"
    def momSel(p: String, cond: String) = s"""
      |${p}m AS (SELECT count(*) AS ${p}n, sum(x) AS ${p}sx,
      |    sum(y) AS ${p}sy,
      |    sum(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
      |      AS ${p}sxx,
      |    sum(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
      |      AS ${p}sxy,
      |    sum(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
      |      AS ${p}syy
      |  FROM pn WHERE $cond)""".stripMargin
    Q("q1159_chow_break_test",
      Some(s"""
        |WITH ${sqlPn},
        |${sqlMo},${momSel("a", "t <= 1995")},${momSel("b", "t > 1995")}
        |SELECT CAST(n AS BIGINT) AS n_cells,
        |       CAST(an AS BIGINT) AS n_pre,
        |       CAST(bn AS BIGINT) AS n_post,
        |       CAST(floor(1000.0 * $f) AS BIGINT) AS chow_f_milli
        |FROM mo CROSS JOIN am CROSS JOIN bm
        |""".stripMargin)) { (s, dir) =>
      val p = pn(s, dir)
      def m(pfx: String, cond: org.apache.spark.sql.Column) =
        p.where(cond).agg(count(lit(1)).as(s"${pfx}n"),
          sum(col("x")).as(s"${pfx}sx"), sum(col("y")).as(s"${pfx}sy"),
          expr("sum(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))")
            .as(s"${pfx}sxx"),
          expr("sum(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))")
            .as(s"${pfx}sxy"),
          expr("sum(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))")
            .as(s"${pfx}syy"))
      mo(s, dir)
        .crossJoin(broadcast(m("a", col("t") <= 1995)))
        .crossJoin(broadcast(m("b", col("t") > 1995)))
        .select(col("n").cast("long").as("n_cells"),
          col("an").cast("long").as("n_pre"),
          col("bn").cast("long").as("n_post"),
          expr(s"CAST(floor(1000.0 * $f) AS BIGINT)").as("chow_f_milli"))
    }
  }

  /** White-HC0 robust SE vs classical for the pooled slope:
    * residuals cent-floored from the shared fitted line, then
    * Σe²·(n·x−Σx)² exact (HUGEINT ≡ chained DECIMAL). */
  def q1160: Q = {
    val b = s"($sxyc / $sxxc)"
    val a = s"((CAST(sy AS DOUBLE) - $b * CAST(sx AS DOUBLE))" +
      " / CAST(n AS DOUBLE))"
    val resid = s"CAST(floor(CAST(y AS DOUBLE) - $a - $b" +
      " * CAST(x AS DOUBLE)) AS BIGINT)"
    val seC = s"(sqrt(($syyc - $b * $b * $sxxc)" +
      s" / (CAST(n AS DOUBLE) - 2.0) / $sxxc))"
    val seW = s"(sqrt(CAST(hw AS DOUBLE) / (CAST(n AS DOUBLE)" +
      s" * CAST(n AS DOUBLE) * $sxxc * $sxxc)))"
    Q("q1160_white_robust_se",
      Some(s"""
        |WITH ${sqlPn},
        |${sqlMo},
        |res AS (SELECT x, $resid AS e, n * x - sx AS cx
        |        FROM pn CROSS JOIN mo),
        |hc AS (SELECT sum(CAST(e AS HUGEINT) * e * cx * cx) AS hw
        |       FROM res)
        |SELECT CAST(n AS BIGINT) AS n_cells,
        |       CAST(floor($seC) AS BIGINT) AS classical_se_cents,
        |       CAST(floor($seW) AS BIGINT) AS white_se_cents,
        |       CAST(floor(1000.0 * $seW / $seC) AS BIGINT)
        |         AS robust_over_classical_milli
        |FROM mo CROSS JOIN hc
        |""".stripMargin)) { (s, dir) =>
      val p = pn(s, dir)
      val m = mo(s, dir)
      val res = p.crossJoin(broadcast(m))
        .select(col("x"), expr(resid).as("e"),
          (col("n") * col("x") - col("sx")).as("cx"))
      val hc = res.agg(
        expr("sum(CAST(e AS DECIMAL(19,0)) * CAST(e AS DECIMAL(19,0))" +
          " * CAST(cx AS DECIMAL(19,0)) * CAST(cx AS DECIMAL(19,0)))")
          .as("hw"))
      m.crossJoin(broadcast(hc))
        .select(col("n").cast("long").as("n_cells"),
          expr(s"CAST(floor($seC) AS BIGINT)").as("classical_se_cents"),
          expr(s"CAST(floor($seW) AS BIGINT)").as("white_se_cents"),
          expr(s"CAST(floor(1000.0 * $seW / $seC) AS BIGINT)")
            .as("robust_over_classical_milli"))
    }
  }
}
