package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables

/** Round-9 teletraffic wave on the event arrival process (each event
  * ≙ a one-hour call, offered load a = events per spanned hour — the
  * stated contract): the Erlang-B blocking curve, Engset's
  * finite-source correction, square-root staffing against an
  * Erlang-C delay target, the arrival peakedness audit, and Riordan's
  * overflow-traffic moments. The Erlang recursion B_c = aB/(c+aB) is
  * a SCALAR walk of Θ(c*) steps carried identically by a Spark
  * `aggregate` fold and a DuckDB RECURSIVE CTE (per the house rule:
  * never list_reduce); a itself is an exact rational pinned to one
  * double. c* scales as the offered load does — inherent to the
  * statistic, not a fact-table scan. */
object TeletrafficQueries {

  val all: Seq[Q] = Seq(q771, q772, q773, q774, q775)

  /** Oracle CTE `lo(n, hours, af)` — event count, spanned hours,
    * offered load as DOUBLE. */
  private def sqlLoad: String = """
    |hr AS (SELECT epoch_us(ts) // 3600000000 AS h FROM events),
    |lo AS (
    |  SELECT count(*) AS n, max(h) - min(h) + 1 AS hours,
    |         CAST(count(*) AS DOUBLE) / (max(h) - min(h) + 1) AS af
    |  FROM hr)""".stripMargin

  private def load(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(expr("ts div 3600000000000").as("h"))
      .agg(count(lit(1)).as("n"),
        (max(col("h")) - min(col("h")) + 1).as("hours"))
      .select(col("n"), col("hours"),
        expr("CAST(n AS DOUBLE) / hours").as("af"))

  /** Erlang-B blocking at server grids c = ceil(a·k/10), k ∈
    * {2,4,…,20}: the loss curve from no capacity to 2× the load.
    * Both engines walk the identical scalar recursion from c = 1. */
  def q771: Q = Q(
    "q771_erlang_b_curve",
    Some(s"""
      |WITH RECURSIVE ${sqlLoad},
      |cm AS (SELECT CAST(ceil(af * 2) AS BIGINT) + 1 AS cmax, af
      |       FROM lo),
      |walk(c, b) AS (
      |  SELECT 0, CAST(1.0 AS DOUBLE)
      |  UNION ALL
      |  SELECT w.c + 1, cm.af * w.b / (w.c + 1 + cm.af * w.b)
      |  FROM walk w CROSS JOIN cm WHERE w.c < cm.cmax),
      |grid AS (
      |  SELECT DISTINCT greatest(1, CAST(ceil(lo.af * k / 10)
      |           AS BIGINT)) AS c
      |  FROM lo CROSS JOIN (SELECT unnest(range(2, 21, 2)) AS k) g)
      |SELECT CAST(grid.c AS BIGINT) AS servers,
      |       CAST(floor(walk.b * 1000000.0) AS BIGINT)
      |         AS blocking_ppm,
      |       CAST(floor(lo.af * 1000.0) AS BIGINT) AS offered_milli
      |FROM grid JOIN walk ON walk.c = grid.c CROSS JOIN lo
      |ORDER BY servers
      |""".stripMargin)) { (s, dir) =>
    val lo = load(s, dir).materialize()
    val grid = lo.select(explode(expr("sequence(2, 20, 2)")).as("k"),
        col("af"))
      .select(greatest(lit(1L),
        ceil(col("af") * col("k") / 10).cast("long")).as("c"))
      .distinct()
    grid.crossJoin(broadcast(lo))
      .select(col("c").as("servers"),
        expr("CAST(floor(aggregate(sequence(1, CAST(c AS INT))," +
          " CAST(1.0 AS DOUBLE)," +
          " (b, k) -> af * b / (k + af * b)) * 1000000.0) AS BIGINT)")
          .as("blocking_ppm"),
        expr("CAST(floor(af * 1000.0) AS BIGINT)").as("offered_milli"))
      .orderBy(col("servers"))
  }

  /** Engset blocking (finite sources): the M observed users each
    * offer α = a/M; time congestion at c = max(1, ceil(0.8a))
    * servers from the term recursion t_k = t_{k−1}·α(M−1−(k−1))/k,
    * next to the infinite-source Erlang-B at the same c — the
    * finite-population correction, made visible. */
  def q772: Q = Q(
    "q772_engset_blocking",
    Some(s"""
      |WITH RECURSIVE ${sqlLoad},
      |mm AS (SELECT count(DISTINCT user_id) AS m FROM events),
      |cc AS (SELECT greatest(1, CAST(ceil(lo.af * 8 / 10) AS BIGINT))
      |         AS c, lo.af / mm.m AS alpha, mm.m, lo.af
      |       FROM lo CROSS JOIN mm),
      |wk(k, t, st, b) AS (
      |  SELECT 0, CAST(1.0 AS DOUBLE), CAST(1.0 AS DOUBLE),
      |         CAST(1.0 AS DOUBLE)
      |  UNION ALL
      |  SELECT w.k + 1,
      |         w.t * cc.alpha * (cc.m - 1 - w.k) / (w.k + 1),
      |         w.st + w.t * cc.alpha * (cc.m - 1 - w.k) / (w.k + 1),
      |         cc.af * w.b / (w.k + 1 + cc.af * w.b)
      |  FROM wk w CROSS JOIN cc WHERE w.k < cc.c),
      |fin AS (SELECT t, st, b FROM wk CROSS JOIN cc WHERE wk.k = cc.c)
      |SELECT CAST(mm.m AS BIGINT) AS n_sources,
      |       CAST(cc.c AS BIGINT) AS servers,
      |       CAST(floor(cc.alpha * 1000000.0) AS BIGINT)
      |         AS alpha_micro,
      |       CAST(floor(fin.t / fin.st * 1000000.0) AS BIGINT)
      |         AS engset_ppm,
      |       CAST(floor(fin.b * 1000000.0) AS BIGINT) AS erlang_b_ppm
      |FROM fin CROSS JOIN mm CROSS JOIN cc
      |""".stripMargin)) { (s, dir) =>
    val lo = load(s, dir)
    val mm = Tables.events(s, dir)
      .agg(countDistinct(col("user_id")).as("m"))
    val cc = lo.crossJoin(broadcast(mm))
      .select(greatest(lit(1L), ceil(col("af") * 8 / 10).cast("long"))
          .as("c"),
        (col("af") / col("m")).as("alpha"), col("m"), col("af"))
    cc.select(col("m").as("n_sources"), col("c").as("servers"),
      expr("CAST(floor(alpha * 1000000.0) AS BIGINT)").as("alpha_micro"),
      expr("CAST(floor(aggregate(sequence(1, CAST(c AS INT))," +
        " named_struct('t', CAST(1.0 AS DOUBLE)," +
        " 'st', CAST(1.0 AS DOUBLE))," +
        " (acc, k) -> named_struct(" +
        " 't', acc.t * alpha * (m - 1 - (k - 1)) / k," +
        " 'st', acc.st + acc.t * alpha * (m - 1 - (k - 1)) / k)," +
        " acc -> acc.t / acc.st) * 1000000.0) AS BIGINT)")
        .as("engset_ppm"),
      expr("CAST(floor(aggregate(sequence(1, CAST(c AS INT))," +
        " CAST(1.0 AS DOUBLE)," +
        " (b, k) -> af * b / (k + af * b)) * 1000000.0) AS BIGINT)")
        .as("erlang_b_ppm"))
  }

  /** Square-root staffing: the smallest c > a with Erlang-C delay
    * probability ≤ 0.2, found in ONE walk carrying (B, found-c); the
    * safety factor β = (c*−a)/√a is the Halfin–Whitt position. */
  def q773: Q = Q(
    "q773_sqrt_staffing",
    Some(s"""
      |WITH RECURSIVE ${sqlLoad},
      |cm AS (SELECT CAST(ceil(af) AS BIGINT)
      |              + CAST(ceil(4 * sqrt(af)) AS BIGINT) + 4 AS cmax,
      |              af
      |       FROM lo),
      |wk(c, b, star, ecs) AS (
      |  SELECT 0, CAST(1.0 AS DOUBLE), CAST(0 AS BIGINT),
      |         CAST(0.0 AS DOUBLE)
      |  UNION ALL
      |  SELECT w.c + 1,
      |         cm.af * w.b / (w.c + 1 + cm.af * w.b),
      |         CASE WHEN w.star = 0 AND w.c + 1 > cm.af
      |               AND (cm.af * w.b / (w.c + 1 + cm.af * w.b))
      |                   / (1.0 - (cm.af / (w.c + 1))
      |                      * (1.0 - cm.af * w.b
      |                         / (w.c + 1 + cm.af * w.b))) <= 0.2
      |              THEN w.c + 1 ELSE w.star END,
      |         CASE WHEN w.star = 0 AND w.c + 1 > cm.af
      |               AND (cm.af * w.b / (w.c + 1 + cm.af * w.b))
      |                   / (1.0 - (cm.af / (w.c + 1))
      |                      * (1.0 - cm.af * w.b
      |                         / (w.c + 1 + cm.af * w.b))) <= 0.2
      |              THEN (cm.af * w.b / (w.c + 1 + cm.af * w.b))
      |                   / (1.0 - (cm.af / (w.c + 1))
      |                      * (1.0 - cm.af * w.b
      |                         / (w.c + 1 + cm.af * w.b)))
      |              ELSE w.ecs END
      |  FROM wk w CROSS JOIN cm WHERE w.c < cm.cmax)
      |SELECT CAST(floor(lo.af * 1000.0) AS BIGINT) AS offered_milli,
      |       CAST(wk.star AS BIGINT) AS c_star,
      |       CAST(floor((wk.star - lo.af) / sqrt(lo.af) * 1000.0)
      |            AS BIGINT) AS beta_milli,
      |       CAST(floor(wk.ecs * 1000000.0) AS BIGINT)
      |         AS erlang_c_ppm
      |FROM wk CROSS JOIN cm CROSS JOIN lo WHERE wk.c = cm.cmax
      |""".stripMargin)) { (s, dir) =>
    val lo = load(s, dir)
    val cm = lo.select(
      (ceil(col("af")).cast("long")
        + ceil(lit(4) * sqrt(col("af"))).cast("long") + 4).as("cmax"),
      col("af"))
    cm.select(
      expr("CAST(floor(af * 1000.0) AS BIGINT)").as("offered_milli"),
      expr("aggregate(sequence(1, CAST(cmax AS INT))," +
        " named_struct('b', CAST(1.0 AS DOUBLE)," +
        " 'star', CAST(0 AS BIGINT), 'ecs', CAST(0.0 AS DOUBLE))," +
        " (w, k) -> named_struct(" +
        " 'b', af * w.b / (k + af * w.b)," +
        " 'star', CASE WHEN w.star = 0 AND k > af" +
        " AND (af * w.b / (k + af * w.b))" +
        " / (1.0 - (af / k) * (1.0 - af * w.b / (k + af * w.b)))" +
        " <= 0.2 THEN CAST(k AS BIGINT) ELSE w.star END," +
        " 'ecs', CASE WHEN w.star = 0 AND k > af" +
        " AND (af * w.b / (k + af * w.b))" +
        " / (1.0 - (af / k) * (1.0 - af * w.b / (k + af * w.b)))" +
        " <= 0.2 THEN (af * w.b / (k + af * w.b))" +
        " / (1.0 - (af / k) * (1.0 - af * w.b / (k + af * w.b)))" +
        " ELSE w.ecs END))").as("st"),
      col("af"))
      .select(col("offered_milli"),
        col("st.star").as("c_star"),
        expr("CAST(floor((st.star - af) / sqrt(af) * 1000.0)" +
          " AS BIGINT)").as("beta_milli"),
        expr("CAST(floor(st.ecs * 1000000.0) AS BIGINT)")
          .as("erlang_c_ppm"))
  }

  /** Arrival peakedness: the hourly-count index of dispersion
    * (variance/mean over the FULL spanned hour grid, empty hours
    * included — exact integer moments) plus the busiest-hour share;
    * z ≫ 1 says Poisson sizing rules understate capacity. */
  def q774: Q = Q(
    "q774_arrival_peakedness",
    Some("""
      |WITH hr AS (
      |  SELECT epoch_us(ts) // 3600000000 AS h FROM events),
      |hc AS (SELECT h, count(*) AS k FROM hr GROUP BY 1),
      |sp AS (SELECT max(h) - min(h) + 1 AS hours,
      |              sum(k) AS n, max(k) AS kmax,
      |              sum(CAST(k AS HUGEINT) * k) AS kk
      |       FROM hc)
      |SELECT CAST(hours AS BIGINT) AS spanned_hours,
      |       CAST(n AS BIGINT) AS n_events,
      |       CAST((1000 * n) // hours AS BIGINT) AS mean_milli,
      |       CAST((1000 * (CAST(hours AS HUGEINT) * kk
      |              - CAST(n AS HUGEINT) * n))
      |            // (CAST(hours AS HUGEINT) * n) AS BIGINT)
      |         AS dispersion_index_milli,
      |       CAST(kmax AS BIGINT) AS busiest_hour_count
      |FROM sp
      |""".stripMargin)) { (s, dir) =>
    Tables.events(s, dir)
      .select(expr("ts div 3600000000000").as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("k"))
      .agg((max(col("h")) - min(col("h")) + 1).as("hours"),
        sum(col("k")).as("n"), max(col("k")).as("kmax"),
        sum(col("k").cast("decimal(38,0)") * col("k")).as("kk"))
      .select(col("hours").cast("long").as("spanned_hours"),
        col("n").as("n_events"),
        expr("CAST((1000 * n) div hours AS BIGINT)").as("mean_milli"),
        expr("CAST((1000 * (CAST(hours AS DECIMAL(38,0)) * kk" +
          " - CAST(n AS DECIMAL(38,0)) * n))" +
          " div (CAST(hours AS DECIMAL(38,0)) * n) AS BIGINT)")
          .as("dispersion_index_milli"),
        col("kmax").cast("long").as("busiest_hour_count"))
  }

  /** Riordan overflow moments from a primary group of c = ceil(0.8a)
    * servers: mean overflow m = a·B(c,a) and variance v =
    * m(1 − m + a/(c+1−a+m)) — the peakedness z = v/m that sizes the
    * overflow group (z > 1: overflow is burstier than Poisson). */
  def q775: Q = Q(
    "q775_riordan_overflow",
    Some(s"""
      |WITH RECURSIVE ${sqlLoad},
      |cc AS (SELECT greatest(1, CAST(ceil(af * 8 / 10) AS BIGINT))
      |         AS c, af
      |       FROM lo),
      |wk(k, b) AS (
      |  SELECT 0, CAST(1.0 AS DOUBLE)
      |  UNION ALL
      |  SELECT w.k + 1, cc.af * w.b / (w.k + 1 + cc.af * w.b)
      |  FROM wk w CROSS JOIN cc WHERE w.k < cc.c),
      |mo AS (
      |  SELECT cc.c, cc.af, cc.af * wk.b AS m
      |  FROM wk CROSS JOIN cc WHERE wk.k = cc.c)
      |SELECT CAST(c AS BIGINT) AS primary_servers,
      |       CAST(floor(m * 1000.0) AS BIGINT) AS overflow_mean_milli,
      |       CAST(floor(m * (1.0 - m + af / (c + 1 - af + m))
      |            * 1000.0) AS BIGINT) AS overflow_var_milli,
      |       CAST(floor((1.0 - m + af / (c + 1 - af + m)) * 1000.0)
      |            AS BIGINT) AS peakedness_milli
      |FROM mo
      |""".stripMargin)) { (s, dir) =>
    load(s, dir)
      .select(greatest(lit(1L), ceil(col("af") * 8 / 10).cast("long"))
        .as("c"), col("af"))
      .select(col("c"), col("af"),
        expr("af * aggregate(sequence(1, CAST(c AS INT))," +
          " CAST(1.0 AS DOUBLE)," +
          " (b, k) -> af * b / (k + af * b))").as("m"))
      .select(col("c").as("primary_servers"),
        expr("CAST(floor(m * 1000.0) AS BIGINT)")
          .as("overflow_mean_milli"),
        expr("CAST(floor(m * (1.0 - m + af / (c + 1 - af + m))" +
          " * 1000.0) AS BIGINT)").as("overflow_var_milli"),
        expr("CAST(floor((1.0 - m + af / (c + 1 - af + m)) * 1000.0)" +
          " AS BIGINT)").as("peakedness_milli"))
  }
}
