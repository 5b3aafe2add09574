package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Materialize.MatOps
import graft.Tables

/** Round-9 seasonal-decomposition wave on monthly shipped revenue
  * (~83 calendar months at every sf): classical ratio-to-centered-
  * moving-average seasonal indices, the STL-style seasonal-strength
  * statistic, a deseasonalized OLS trend, a month-of-year χ²
  * concentration profile, and Holt's double-exponential level/trend
  * fold (α=1/5, β=1/10) replayed step-exactly in both engines.
  *
  * Scale: the month series is CALENDAR-bounded, so the single-
  * partition windows here are constant-size at any sf — only the
  * month-grain groupBy touches facts. The centered MA-12 uses the
  * half-weight endpoint convention (×24 integer scale, no division);
  * ratios/indices are micro-floored integers; variance terms are
  * integer normal-equation forms; χ² terms are per-month integer
  * floors summed exactly (never a cross-row double sum). The Holt
  * fold is DECIMAL(38,0) per-step truncating arithmetic — Spark folds
  * the sorted month array with the `aggregate` HOF, DuckDB replays
  * the identical recurrence as a RECURSIVE CTE. */
object SeasonalQueries {

  val all: Seq[Q] = Seq(q806, q807, q808, q809, q810)

  private def sqlSq: String = """
    |mo AS (
    |  SELECT (year(l_shipdate) - 1995) * 12 + month(l_shipdate) - 1 AS m,
    |         month(l_shipdate) AS moy,
    |         sum(CAST(l_extendedprice * 100 AS BIGINT)) AS rev
    |  FROM lineitem GROUP BY 1, 2),
    |sq AS (SELECT row_number() OVER (ORDER BY m) AS t, m, moy, rev
    |       FROM mo)""".stripMargin

  /** Oracle interior ratio-to-CMA rows `rt(t, moy, ratio)` (micro). */
  private def sqlRt: String = """
    |cma AS (
    |  SELECT t, moy, rev,
    |         2 * sum(rev) OVER w13 - lag(rev, 6) OVER wo
    |           - lead(rev, 6) OVER wo AS cma2x,
    |         count(*) OVER w13 AS nw
    |  FROM sq
    |  WINDOW w13 AS (ORDER BY t ROWS BETWEEN 6 PRECEDING
    |                 AND 6 FOLLOWING),
    |         wo AS (ORDER BY t)),
    |rt AS (SELECT t, moy,
    |              (24000000 * CAST(rev AS HUGEINT)) // cma2x AS ratio
    |       FROM cma WHERE nw = 13),
    |idx AS (SELECT moy, count(*) AS nr, sum(ratio) // count(*) AS im
    |        FROM rt GROUP BY 1)""".stripMargin

  /** Spark month series (t, m, moy, rev). */
  private def sqBase(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(((year(col("l_shipdate")) - 1995) * 12
        + month(col("l_shipdate")) - 1).as("m"),
        month(col("l_shipdate")).as("moy"),
        expr("CAST(CAST(l_extendedprice * 100 AS DECIMAL(38,0)) AS LONG)")
          .as("v"))
      .groupBy(col("m"), col("moy"))
      .agg(sum(col("v")).as("rev"))
      .select(row_number().over(Window.orderBy(col("m"))).as("t"),
        col("m"), col("moy"), col("rev"))

  /** Spark interior ratios (t, moy, ratio micro). */
  private def rtBase(sq: DataFrame): DataFrame = {
    val wo = Window.orderBy(col("t"))
    val w13 = wo.rowsBetween(-6, 6)
    sq.select(col("t"), col("moy"), col("rev"),
        (sum(col("rev")).over(w13) * 2 - lag(col("rev"), 6).over(wo)
          - lead(col("rev"), 6).over(wo)).as("cma2x"),
        count(lit(1)).over(w13).as("nw"))
      .where(col("nw") === 13)
      .select(col("t"), col("moy"),
        expr("CAST((24000000 * CAST(rev AS DECIMAL(38,0))" +
          " - (24000000 * CAST(rev AS DECIMAL(38,0))) % cma2x)" +
          " / cma2x AS DECIMAL(38,0))").as("ratio"))
  }

  private def idxBase(rt: DataFrame): DataFrame =
    rt.groupBy(col("moy"))
      .agg(count(lit(1)).as("nr"), sum(col("ratio")).as("srt"))
      .select(col("moy"), col("nr"),
        expr("CAST(srt div nr AS DECIMAL(38,0))").as("im"))

  /** Ratio-to-moving-average seasonal indices: per month-of-year the
    * mean interior ratio of revenue to its centered MA-12. */
  def q806: Q = Q(
    "q806_seasonal_indices",
    Some(s"""
      |WITH ${sqlSq},${sqlRt}
      |SELECT CAST(moy AS BIGINT) AS moy, CAST(nr AS BIGINT) AS n_ratios,
      |       CAST(im AS BIGINT) AS idx_micro
      |FROM idx ORDER BY moy
      |""".stripMargin)) { (s, dir) =>
    idxBase(rtBase(sqBase(s, dir)))
      .select(col("moy").cast("long").as("moy"),
        col("nr").cast("long").as("n_ratios"),
        col("im").cast("long").as("idx_micro"))
      .orderBy(col("moy"))
  }

  /** Seasonal strength: 1 − Var(ratio − seasonal index)/Var(ratio)
    * over the interior months, clamped at 0 — the ratio-decomposition
    * analogue of STL's F_s. */
  def q807: Q = Q(
    "q807_seasonal_strength",
    Some(s"""
      |WITH ${sqlSq},${sqlRt},
      |rm AS (
      |  SELECT rt.ratio AS x, rt.ratio - idx.im AS e
      |  FROM rt JOIN idx ON idx.moy = rt.moy),
      |mo2 AS (SELECT count(*) AS n, sum(x) AS sx, sum(x * x) AS sxx,
      |               sum(e) AS se, sum(e * e) AS see FROM rm)
      |SELECT CAST(n AS BIGINT) AS n_interior,
      |       CAST(greatest(0, floor(1000.0 * (1.0 -
      |         CAST(n * see - se * se AS DOUBLE)
      |         / CAST(n * sxx - sx * sx AS DOUBLE)))) AS BIGINT)
      |         AS strength_milli
      |FROM mo2
      |""".stripMargin)) { (s, dir) =>
    val rt = rtBase(sqBase(s, dir)).materialize()
    val rm = rt.join(broadcast(idxBase(rt)), Seq("moy"))
      .select(col("ratio").as("x"), (col("ratio") - col("im")).as("e"))
    rm.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"), sum(col("e")).as("se"),
        sum(col("e") * col("e")).as("see"))
      .select(col("n").cast("long").as("n_interior"),
        expr("""CAST(greatest(0, floor(1000.0 * (1.0 -
          |  CAST(n * see - se * se AS DOUBLE)
          |  / CAST(n * sxx - sx * sx AS DOUBLE)))) AS BIGINT)"""
          .stripMargin).as("strength_milli"))
  }

  /** Deseasonalized linear trend: every month's revenue divided by its
    * seasonal index (exact integer floor), then the OLS slope on the
    * month index — cents per month, milli-floored. */
  def q808: Q = Q(
    "q808_deseasonalized_trend",
    Some(s"""
      |WITH ${sqlSq},${sqlRt},
      |ds AS (
      |  SELECT CAST(sq.t AS HUGEINT) AS x,
      |         (1000000 * CAST(sq.rev AS HUGEINT)) // idx.im AS y
      |  FROM sq JOIN idx ON idx.moy = sq.moy),
      |mo2 AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
      |               sum(x * y) AS sxy, sum(x * x) AS sxx FROM ds)
      |SELECT CAST(n AS BIGINT) AS n_months,
      |       CAST(floor(1000.0 * CAST(n * sxy - sx * sy AS DOUBLE)
      |            / CAST(n * sxx - sx * sx AS DOUBLE)) AS BIGINT)
      |         AS slope_cents_milli
      |FROM mo2
      |""".stripMargin)) { (s, dir) =>
    val sq = sqBase(s, dir).materialize()
    val ds = sq.join(broadcast(idxBase(rtBase(sq))), Seq("moy"))
      .select(col("t").cast("decimal(38,0)").as("x"),
        expr("CAST((1000000 * CAST(rev AS DECIMAL(38,0))" +
          " - (1000000 * CAST(rev AS DECIMAL(38,0))) % im)" +
          " / im AS DECIMAL(38,0))").as("y"))
    ds.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("n").cast("long").as("n_months"),
        expr("""CAST(floor(1000.0 * CAST(n * sxy - sx * sy AS DOUBLE)
          |  / CAST(n * sxx - sx * sx AS DOUBLE)) AS BIGINT)"""
          .stripMargin).as("slope_cents_milli"))
  }

  /** Month-of-year concentration: χ² of month-of-year revenue totals
    * against the month-count-weighted uniform expectation (per-term
    * integer floors, exact sum), plus the peak and trough months. */
  def q809: Q = Q(
    "q809_month_chi2",
    Some(s"""
      |WITH ${sqlSq},
      |g AS (SELECT moy, count(*) AS nm, sum(CAST(rev AS HUGEINT)) AS rv
      |      FROM sq GROUP BY 1),
      |gl AS (SELECT sum(nm) AS nn, sum(rv) AS tt FROM g),
      |tm AS (
      |  SELECT (gl.nn * g.rv - gl.tt * g.nm)
      |         * (gl.nn * g.rv - gl.tt * g.nm)
      |         // (gl.nn * gl.tt * g.nm) AS term
      |  FROM g CROSS JOIN gl)
      |SELECT CAST((SELECT sum(term) FROM tm) AS BIGINT) AS chi2_cents,
      |       CAST((SELECT moy FROM g ORDER BY rv DESC, moy LIMIT 1)
      |            AS BIGINT) AS peak_moy,
      |       CAST((SELECT moy FROM g ORDER BY rv ASC, moy LIMIT 1)
      |            AS BIGINT) AS trough_moy
      |""".stripMargin)) { (s, dir) =>
    val g = sqBase(s, dir)
      .groupBy(col("moy"))
      .agg(count(lit(1)).as("nm"),
        sum(col("rev")).cast("decimal(38,0)").as("rv"))
      .materialize()
    val gl = g.agg(sum(col("nm")).as("nn"), sum(col("rv")).as("tt"))
    val chi = g.crossJoin(broadcast(gl))
      .select(expr(
        """CAST(((nn * rv - tt * nm) * (nn * rv - tt * nm)
          |  - ((nn * rv - tt * nm) * (nn * rv - tt * nm))
          |    % (nn * tt * nm)) / (nn * tt * nm) AS DECIMAL(38,0))"""
          .stripMargin).as("term"))
      .agg(sum(col("term")).as("chi2"))
    val peak = g.orderBy(col("rv").desc, col("moy")).limit(1)
      .select(col("moy").as("peak"))
    val trough = g.orderBy(col("rv").asc, col("moy")).limit(1)
      .select(col("moy").as("trough"))
    chi.crossJoin(broadcast(peak)).crossJoin(broadcast(trough))
      .select(col("chi2").cast("long").as("chi2_cents"),
        col("peak").cast("long").as("peak_moy"),
        col("trough").cast("long").as("trough_moy"))
  }

  /** Holt double-exponential smoothing (α=1/5, β=1/10) over the month
    * series: per-step truncating integer recurrence, final level/
    * trend/one-step forecast. */
  def q810: Q = Q(
    "q810_holt_smoothing",
    Some(s"""
      |WITH RECURSIVE ${sqlSq},
      |walk AS (
      |  SELECT t, CAST(rev AS HUGEINT) AS l, CAST(0 AS HUGEINT) AS b
      |  FROM sq WHERE t = 1
      |  UNION ALL
      |  SELECT s.t,
      |         (CAST(s.rev AS HUGEINT) + 4 * (w.l + w.b)) // 5,
      |         (((CAST(s.rev AS HUGEINT) + 4 * (w.l + w.b)) // 5 - w.l)
      |          + 9 * w.b) // 10
      |  FROM walk w JOIN sq s ON s.t = w.t + 1),
      |fin AS (SELECT max(t) AS n, max_by(l, t) AS l, max_by(b, t) AS b
      |        FROM walk)
      |SELECT CAST(n AS BIGINT) AS n_months,
      |       CAST(l AS BIGINT) AS level_cents,
      |       CAST(b AS BIGINT) AS trend_cents,
      |       CAST(l + b AS BIGINT) AS forecast_next_cents
      |FROM fin
      |""".stripMargin)) { (s, dir) =>
    sqBase(s, dir)
      .agg(sort_array(collect_list(struct(col("t"), col("rev")))).as("xs"))
      .select(expr(
        """aggregate(
          |  xs,
          |  named_struct('n', CAST(0 AS INT),
          |               'l', CAST(0 AS DECIMAL(38,0)),
          |               'b', CAST(0 AS DECIMAL(38,0))),
          |  (acc, x) -> IF(acc.n = 0,
          |    named_struct('n', 1, 'l', CAST(x.rev AS DECIMAL(38,0)),
          |                 'b', CAST(0 AS DECIMAL(38,0))),
          |    named_struct('n', acc.n + 1,
          |      'l', CAST((CAST(x.rev AS DECIMAL(38,0)) + 4 * (acc.l + acc.b)) div 5
          |                AS DECIMAL(38,0)),
          |      'b', CAST(((CAST(x.rev AS DECIMAL(38,0)) + 4 * (acc.l + acc.b)) div 5
          |                 - acc.l + 9 * acc.b) div 10 AS DECIMAL(38,0)))))"""
          .stripMargin).as("acc"))
      .select(col("acc.n").cast("long").as("n_months"),
        col("acc.l").cast("long").as("level_cents"),
        col("acc.b").cast("long").as("trend_cents"),
        (col("acc.l") + col("acc.b")).cast("long")
          .as("forecast_next_cents"))
  }
}
