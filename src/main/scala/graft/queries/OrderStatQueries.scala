package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Materialize.MatOps
import graft.Tables
import graft.dedup.SortedNeighborhood

/** Round-9 order-statistic estimation wave: the German-tank
  * (serial-number) problem on the 1997 order-key sample with the
  * known population maximum as ground truth — MVUE vs MLE vs
  * method-of-moments vs midrange estimators — plus sample-spacing
  * uniformity diagnostics, quasi-ranges, and midrange/range
  * efficiency on the daily revenue panel.
  *
  * Scale: the serial-number sample is one pushed-down year filter;
  * its rank/gap spine rides [[SortedNeighborhood.globalRankCum]].
  * The quasi-range/midrange queries run on the calendar-bounded day
  * dim. Every estimator is an exact integer expression. */
object OrderStatQueries {

  val all: Seq[Q] = Seq(q896, q897, q898, q899, q900)

  private def sqlSample: String = """
    |sm AS (SELECT o_orderkey AS x FROM orders
    |       WHERE year(o_orderdate) = 1997),
    |st AS (SELECT count(*) AS k, max(x) AS m, min(x) AS mn,
    |              sum(CAST(x AS HUGEINT)) AS s FROM sm),
    |tr AS (SELECT max(o_orderkey) AS nt FROM orders)""".stripMargin

  private def stBase(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val sm = Tables.orders(s, dir)
      .where(year(col("o_orderdate")) === 1997)
      .select(col("o_orderkey").as("x"))
    val st = sm.agg(count(lit(1)).as("k"), max(col("x")).as("m"),
      min(col("x")).as("mn"), sum(col("x").cast("decimal(38,0)")).as("s"))
    val tr = Tables.orders(s, dir).agg(max(col("o_orderkey")).as("nt"))
    (st, tr)
  }

  /** German-tank MVUE m(1 + 1/k) − 1 against the known maximum. */
  def q896: Q = Q(
    "q896_german_tank",
    Some(s"""
      |WITH ${sqlSample}
      |SELECT CAST(k AS BIGINT) AS k_sample,
      |       CAST(m AS BIGINT) AS sample_max,
      |       CAST(nt AS BIGINT) AS true_n,
      |       CAST(m + (m - k) // k AS BIGINT) AS mvue_estimate,
      |       CAST((1000 * (m + (m - k) // k)) // nt AS BIGINT)
      |         AS mvue_ratio_milli
      |FROM st CROSS JOIN tr
      |""".stripMargin)) { (s, dir) =>
    val (st, tr) = stBase(s, dir)
    st.crossJoin(broadcast(tr))
      .select(col("k").cast("long").as("k_sample"),
        col("m").cast("long").as("sample_max"),
        col("nt").cast("long").as("true_n"),
        expr("CAST(m + (m - k) div k AS BIGINT)").as("mvue_estimate"),
        expr("CAST((1000 * (m + (m - k) div k)) div nt AS BIGINT)")
          .as("mvue_ratio_milli"))
  }

  /** Four serial-number estimators side by side with signed milli
    * error against the known maximum. */
  def q897: Q = Q(
    "q897_serial_estimators",
    Some(s"""
      |WITH ${sqlSample},
      |es AS (
      |  SELECT 'mle_max' AS est, CAST(m AS HUGEINT) AS v
      |  FROM st
      |  UNION ALL
      |  SELECT 'mvue', CAST(m + (m - k) // k AS HUGEINT) FROM st
      |  UNION ALL
      |  SELECT 'mom_2mean', CAST((2 * s) // k - 1 AS HUGEINT) FROM st
      |  UNION ALL
      |  SELECT 'midrange', CAST(m + mn - 1 AS HUGEINT) FROM st)
      |SELECT est, CAST(v AS BIGINT) AS estimate,
      |       CAST((1000 * (v - tr.nt)) // tr.nt AS BIGINT)
      |         AS error_milli
      |FROM es CROSS JOIN tr ORDER BY est
      |""".stripMargin)) { (s, dir) =>
    val (st, tr) = stBase(s, dir)
    st.select(expr(
        """stack(4,
          |  'mle_max', CAST(m AS DECIMAL(38,0)),
          |  'mvue', CAST(m + (m - k) div k AS DECIMAL(38,0)),
          |  'mom_2mean', CAST((2 * s - (2 * s) % k) / k - 1
          |               AS DECIMAL(38,0)),
          |  'midrange', CAST(m + mn - 1 AS DECIMAL(38,0)))
          |  AS (est, v)""".stripMargin))
      .crossJoin(broadcast(tr))
      .select(col("est"), col("v").cast("long").as("estimate"),
        expr("CAST((1000 * (v - nt)) div nt AS BIGINT)")
          .as("error_milli"))
      .orderBy(col("est"))
  }

  /** Sample-spacing uniformity: sorted-key gap max/mean/CV — under
    * uniform sampling gaps are ~iid geometric. */
  def q898: Q = Q(
    "q898_sample_spacings",
    Some(s"""
      |WITH ${sqlSample},
      |rk AS (SELECT x, row_number() OVER (ORDER BY x) AS r FROM sm),
      |gp AS (SELECT b.x - a.x AS g FROM rk a JOIN rk b ON b.r = a.r + 1),
      |mo AS (SELECT count(*) AS n, sum(CAST(g AS HUGEINT)) AS sg,
      |              sum(CAST(g AS HUGEINT) * g) AS qg, max(g) AS mg
      |       FROM gp)
      |SELECT CAST(n AS BIGINT) AS n_gaps,
      |       CAST(mg AS BIGINT) AS max_gap,
      |       CAST((1000 * sg) // n AS BIGINT) AS mean_gap_milli,
      |       CAST(floor(1000.0 * sqrt(CAST(n * qg - sg * sg AS DOUBLE)
      |            / (CAST(n AS DOUBLE) * (n - 1)))
      |            / (CAST(sg AS DOUBLE) / n)) AS BIGINT) AS gap_cv_milli
      |FROM mo
      |""".stripMargin)) { (s, dir) =>
    val sm = Tables.orders(s, dir)
      .where(year(col("o_orderdate")) === 1997)
      .select(col("o_orderkey").as("x"))
      .withColumn("xb", expr("x div 1024"))
    val rk = SortedNeighborhood.globalRankCum(sm, "x", "xb", Seq.empty)
      .select(col("x"), col("__rank").as("r"))
    val gp = rk.join(rk.select((col("r") - 1).as("rb"), col("x").as("xb2")),
        col("r") === col("rb"))
      .select((col("xb2") - col("x")).cast("decimal(38,0)").as("g"))
    gp.agg(count(lit(1)).as("n"), sum(col("g")).as("sg"),
        sum(col("g") * col("g")).as("qg"), max(col("g")).as("mg"))
      .select(col("n").cast("long").as("n_gaps"),
        col("mg").cast("long").as("max_gap"),
        expr("CAST((1000 * sg - (1000 * sg) % n) / n AS DECIMAL(38,0))")
          .cast("long").as("mean_gap_milli"),
        expr("""CAST(floor(1000.0 * sqrt(CAST(n * qg - sg * sg AS DOUBLE)
          |  / (CAST(n AS DOUBLE) * (n - 1)))
          |  / (CAST(sg AS DOUBLE) / n)) AS BIGINT)""".stripMargin)
          .as("gap_cv_milli"))
  }

  /** Quasi-ranges of daily revenue: W_k = X₍n+1−k₎ − X₍k₎ for
    * k ∈ {1,2,5,10,25}, with the share of the full range. */
  def q899: Q = Q(
    "q899_quasi_ranges",
    Some("""
      |WITH day AS (SELECT CAST(l_shipdate AS DATE) AS d,
      |                    sum(CAST(l_extendedprice * 100 AS BIGINT))
      |                      AS x
      |             FROM lineitem GROUP BY 1),
      |gl AS (SELECT count(*) AS n FROM day),
      |rk AS (SELECT x, row_number() OVER (ORDER BY x, d) AS r FROM day),
      |kk AS (SELECT * FROM (VALUES (1),(2),(5),(10),(25)) AS t(k)),
      |qr AS (
      |  SELECT kk.k, hi.x - lo.x AS w
      |  FROM kk CROSS JOIN gl
      |  JOIN rk lo ON lo.r = kk.k
      |  JOIN rk hi ON hi.r = gl.n + 1 - kk.k),
      |fr AS (SELECT w AS full_w FROM qr WHERE k = 1)
      |SELECT CAST(qr.k AS BIGINT) AS k,
      |       CAST(qr.w AS BIGINT) AS quasi_range_cents,
      |       CAST((1000 * qr.w) // fr.full_w AS BIGINT) AS share_milli
      |FROM qr CROSS JOIN fr ORDER BY k
      |""".stripMargin)) { (s, dir) =>
    val day = Tables.lineitem(s, dir)
      .select(col("l_shipdate").cast("date").as("d"),
        expr("CAST(CAST(l_extendedprice * 100 AS DECIMAL(38,0)) AS LONG)")
          .as("v"))
      .groupBy(col("d")).agg(sum(col("v")).as("x"))
    val gl = day.agg(count(lit(1)).as("n"))
    val rk = day.select(col("x"),
      row_number().over(Window.orderBy(col("x"), col("d"))).as("r"))
      .materialize()
    val kk = s.createDataFrame(Seq(1, 2, 5, 10, 25).map(Tuple1(_)))
      .toDF("k")
    val qr = broadcast(kk).crossJoin(broadcast(gl))
      .join(rk.select(col("r").as("rlo"), col("x").as("xlo")),
        col("rlo") === col("k"))
      .join(rk.select(col("r").as("rhi"), col("x").as("xhi")),
        col("rhi") === col("n") + 1 - col("k"))
      .select(col("k"), (col("xhi") - col("xlo")).as("w"))
      .materialize()
    val fr = qr.where(col("k") === 1).select(col("w").as("full_w"))
    qr.crossJoin(broadcast(fr))
      .select(col("k").cast("long").as("k"),
        col("w").cast("long").as("quasi_range_cents"),
        expr("CAST((1000 * w) div full_w AS BIGINT)").as("share_milli"))
      .orderBy(col("k"))
  }

  /** Midrange vs mean and the range/sd ratio on daily revenue. */
  def q900: Q = Q(
    "q900_midrange_efficiency",
    Some("""
      |WITH day AS (SELECT CAST(l_shipdate AS DATE) AS d,
      |                    sum(CAST(l_extendedprice * 100 AS BIGINT))
      |                      AS x
      |             FROM lineitem GROUP BY 1),
      |mo AS (SELECT count(*) AS n, sum(CAST(x AS HUGEINT)) AS s,
      |              sum(CAST(x AS HUGEINT) * x) AS q,
      |              min(x) AS mn, max(x) AS mx FROM day)
      |SELECT CAST((mn + mx) // 2 AS BIGINT) AS midrange_cents,
      |       CAST(s // n AS BIGINT) AS mean_cents,
      |       CAST(mx - mn AS BIGINT) AS range_cents,
      |       CAST(floor(1000.0 * (mx - mn)
      |            / sqrt(CAST(n * q - s * s AS DOUBLE)
      |                   / (CAST(n AS DOUBLE) * (n - 1)))) AS BIGINT)
      |         AS range_over_sd_milli
      |FROM mo
      |""".stripMargin)) { (s, dir) =>
    Tables.lineitem(s, dir)
      .select(col("l_shipdate").cast("date").as("d"),
        expr("CAST(CAST(l_extendedprice * 100 AS DECIMAL(38,0)) AS LONG)")
          .as("v"))
      .groupBy(col("d")).agg(sum(col("v")).as("x"))
      .select(col("x").cast("decimal(38,0)").as("xd"), col("x"))
      .agg(count(lit(1)).as("n"), sum(col("xd")).as("s"),
        sum(col("xd") * col("xd")).as("q"), min(col("x")).as("mn"),
        max(col("x")).as("mx"))
      .select(expr("CAST((mn + mx) div 2 AS BIGINT)").as("midrange_cents"),
        expr("CAST((s - s % n) / n AS DECIMAL(38,0))").cast("long")
          .as("mean_cents"),
        (col("mx") - col("mn")).cast("long").as("range_cents"),
        expr("""CAST(floor(1000.0 * (mx - mn)
          |  / sqrt(CAST(n * q - s * s AS DOUBLE)
          |         / (CAST(n AS DOUBLE) * (n - 1)))) AS BIGINT)"""
          .stripMargin).as("range_over_sd_milli"))
  }
}
