package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables

/** Round-8 quality-stat wave: Mood's median test across regions,
  * process capability (Cp/Cpk), Cochran's Q over three related binary
  * flags, Kendall's τ-b on the daily (net, volume) pair, and Theil's
  * U of the seasonal-naive forecast. The one fact-scaled order
  * statistic (the grand median) rides bucket-parallel globalRankCum;
  * pair counts live on the day² calendar dim; seasonal lags are
  * VALUE joins. */
object QualityStatQueries {

  val all: Seq[Q] = Seq(q651, q652, q653, q654, q655)

  /** Mood's median test: does the share of orders above the GRAND
    * median price differ by customer region? The grand median is the
    * ⌈n/2⌉-th order statistic over the fact-scaled price dim —
    * bucket-parallel rank, never a single-partition sort; the χ² over
    * the 5×2 table is exact counts with pinned expected values. */
  def q651: Q = Q(
    "q651_moods_median",
    Some("""
      |WITH oc AS (
      |  SELECT n.n_regionkey AS rg,
      |         CAST(o.o_totalprice * 100 AS HUGEINT) AS x,
      |         o.o_orderkey AS id
      |  FROM orders o
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey),
      |md AS (
      |  SELECT max(CASE WHEN rn = (500 * n + 999) // 1000 THEN x END)
      |           AS med
      |  FROM (SELECT x, row_number() OVER (ORDER BY x, id) AS rn,
      |               count(*) OVER () AS n FROM oc) r),
      |tab AS (
      |  SELECT rg, count(*) FILTER (x > md.med) AS a,
      |         count(*) FILTER (x <= md.med) AS b
      |  FROM oc CROSS JOIN md GROUP BY 1),
      |tot AS (SELECT sum(a) AS ta, sum(b) AS tb, sum(a + b) AS n
      |        FROM tab),
      |chi AS (
      |  SELECT sum(
      |    (CAST(a AS DOUBLE) - CAST((a + b) AS DOUBLE) * tot.ta / tot.n)
      |      * (CAST(a AS DOUBLE)
      |         - CAST((a + b) AS DOUBLE) * tot.ta / tot.n)
      |      / (CAST((a + b) AS DOUBLE) * tot.ta / tot.n)
      |    + (CAST(b AS DOUBLE) - CAST((a + b) AS DOUBLE) * tot.tb / tot.n)
      |      * (CAST(b AS DOUBLE)
      |         - CAST((a + b) AS DOUBLE) * tot.tb / tot.n)
      |      / (CAST((a + b) AS DOUBLE) * tot.tb / tot.n)) AS x2
      |  FROM tab CROSS JOIN tot)
      |SELECT CAST(tot.n AS BIGINT) AS n_orders,
      |       CAST(md.med AS BIGINT) AS grand_median_cents,
      |       CAST(floor(chi.x2 * 1000.0) AS BIGINT) AS chi2_milli
      |FROM chi CROSS JOIN tot CROSS JOIN md
      |""".stripMargin)) { (s, dir) =>
    val oc = Tables.orders(s, dir)
      .join(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(s, dir)
        .select(col("n_nationkey"), col("n_regionkey").as("rg")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("rg"),
        expr("CAST(o_totalprice * 100 AS DECIMAL(38,0))").as("x"),
        col("o_orderkey").as("id"))
      .materialize() // the median rank AND the table read it
    val n = oc.count()
    val target = (500L * n + 999) / 1000
    // grand median over the fact-scaled price dim: bucket-parallel
    // rank ($10k buckets), filter to THE target rank
    val md = graft.dedup.SortedNeighborhood.globalRankCum(
        oc.withColumn("__bkt", expr("CAST(x AS BIGINT) div 1000000")),
        idCol = "id", bucketCol = "__bkt", tieCols = Seq("x"))
      .where(col("__rank") === target)
      .agg(max(col("x")).as("med"))
    val tab = oc.crossJoin(broadcast(md))
      .groupBy(col("rg"))
      .agg(count(when(col("x") > col("med"), 1)).as("a"),
        count(when(col("x") <= col("med"), 1)).as("b"))
      .materialize()
    val tot = tab.agg(sum(col("a")).as("ta"), sum(col("b")).as("tb"),
      sum(col("a") + col("b")).as("n"))
    val chi = tab.crossJoin(broadcast(tot))
      .agg(sum(expr(
        "(CAST(a AS DOUBLE) - CAST((a + b) AS DOUBLE) * ta / n)" +
          " * (CAST(a AS DOUBLE) - CAST((a + b) AS DOUBLE) * ta / n)" +
          " / (CAST((a + b) AS DOUBLE) * ta / n)" +
          " + (CAST(b AS DOUBLE) - CAST((a + b) AS DOUBLE) * tb / n)" +
          " * (CAST(b AS DOUBLE) - CAST((a + b) AS DOUBLE) * tb / n)" +
          " / (CAST((a + b) AS DOUBLE) * tb / n)")).as("x2"))
    chi.crossJoin(broadcast(tot)).crossJoin(broadcast(md))
      .select(col("n").as("n_orders"),
        col("med").cast("long").as("grand_median_cents"),
        expr("CAST(floor(x2 * 1000.0) AS BIGINT)").as("chi2_milli"))
  }

  /** Process capability of line quantity against spec limits [5, 45]:
    * Cp = (USL−LSL)/6σ, Cpk = min(USL−μ, μ−LSL)/3σ from exact
    * moments, plus the EXACT out-of-spec ppm — the "is the process
    * capable or merely centered" pair, with the observed violation
    * rate the indices are supposed to predict. */
  def q652: Q = {
    val mu = "CAST(sv AS DOUBLE) / CAST(n AS DOUBLE)"
    // sv² goes through the wide type too: a bare long×long Σquantity²
    // overflows under ANSI around sf20 while the oracle's HUGEINT
    // stays exact — the q586/q590 decimal-square discipline
    val sd = "sqrt(CAST(CAST(n AS HUGEINT) * q2" +
      " - CAST(sv AS HUGEINT) * sv AS DOUBLE)" +
      " / (CAST(n AS DOUBLE) * (n - 1)))"
    val sdS = sd.replace("HUGEINT", "DECIMAL(38,0)")
    Q("q652_process_capability",
      Some(s"""
        |WITH x AS (
        |  SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS v
        |  FROM lineitem),
        |mo AS (
        |  SELECT count(*) AS n, sum(v) AS sv,
        |         sum(CAST(v AS HUGEINT) * v) AS q2,
        |         count(*) FILTER (v < 5 OR v > 45) AS oos
        |  FROM x)
        |SELECT CAST(n AS BIGINT) AS n_lines,
        |       CAST(floor(($mu) * 1000.0) AS BIGINT) AS mean_milli,
        |       CAST(floor($sd * 1000.0) AS BIGINT) AS sigma_milli,
        |       CAST(floor(40.0 / (6.0 * $sd) * 1000.0) AS BIGINT)
        |         AS cp_milli,
        |       CAST(floor(least(45.0 - ($mu), ($mu) - 5.0)
        |         / (3.0 * $sd) * 1000.0) AS BIGINT) AS cpk_milli,
        |       CAST((1000000 * oos) // n AS BIGINT) AS oos_ppm
        |FROM mo
        |""".stripMargin)) { (s, dir) =>
      Tables.lineitem(s, dir)
        .select(expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").as("v"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
          sum(expr("CAST(v AS DECIMAL(38,0)) * v")).as("q2"),
          count(when(col("v") < 5 || col("v") > 45, 1)).as("oos"))
        .select(col("n").as("n_lines"),
          expr(s"CAST(floor(($mu) * 1000.0) AS BIGINT)").as("mean_milli"),
          expr(s"CAST(floor($sdS * 1000.0) AS BIGINT)").as("sigma_milli"),
          expr(s"CAST(floor(40.0 / (6.0 * $sdS) * 1000.0) AS BIGINT)")
            .as("cp_milli"),
          expr(s"CAST(floor(least(45.0 - ($mu), ($mu) - 5.0)" +
            s" / (3.0 * $sdS) * 1000.0) AS BIGINT)").as("cpk_milli"),
          expr("CAST((1000000 * oos) div n AS BIGINT)").as("oos_ppm"))
    }
  }

  /** Cochran's Q across three related binary order flags (deep
    * discount, any return, urgent priority): Q = (k−1)(kΣC² − (ΣC)²)
    * / (kΣR − ΣR²) — all exact integers from one pass (row sums take
    * values 0..3, so ΣR² aggregates a 4-value dim). The k-treatment
    * generalization of McNemar that q635's Bowker doesn't give for
    * MATCHED flags on the same unit. */
  def q653: Q = Q(
    "q653_cochran_q",
    Some("""
      |WITH f AS (
      |  SELECT o.o_orderkey AS id,
      |         max(CASE WHEN l.l_discount >= 0.05 THEN 1 ELSE 0 END)
      |           AS x1,
      |         max(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
      |           AS x2,
      |         CASE WHEN any_value(o.o_orderpriority)
      |              IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END AS x3
      |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |  GROUP BY 1),
      |ag AS (
      |  SELECT count(*) AS n, sum(x1) AS c1, sum(x2) AS c2,
      |         sum(x3) AS c3,
      |         sum(x1 + x2 + x3) AS sr,
      |         sum((x1 + x2 + x3) * (x1 + x2 + x3)) AS sr2
      |  FROM f)
      |SELECT CAST(n AS BIGINT) AS n_orders,
      |       CAST(c1 AS BIGINT) AS n_deep_discount,
      |       CAST(c2 AS BIGINT) AS n_returned,
      |       CAST(c3 AS BIGINT) AS n_urgent,
      |       CAST(floor(2.0
      |         * CAST(3 * (c1 * c1 + c2 * c2 + c3 * c3)
      |                - sr * sr AS DOUBLE)
      |         / CAST(3 * sr - sr2 AS DOUBLE) * 1000.0) AS BIGINT)
      |         AS q_milli
      |FROM ag
      |""".stripMargin)) { (s, dir) =>
    val f = Tables.orders(s, dir)
      .select(col("o_orderkey").as("id"),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L).as("pri"))
      .join(Tables.lineitem(s, dir).select(col("l_orderkey"),
        col("l_discount"), col("l_returnflag")),
        col("id") === col("l_orderkey"))
      .groupBy(col("id"), col("pri"))
      .agg(max(when(col("l_discount") >= 0.05, 1L).otherwise(0L))
        .as("x1"),
        max(when(col("l_returnflag") === "R", 1L).otherwise(0L))
          .as("x2"))
      .select(col("id"), col("x1"), col("x2"), col("pri").as("x3"))
    f.agg(count(lit(1)).as("n"), sum(col("x1")).as("c1"),
        sum(col("x2")).as("c2"), sum(col("x3")).as("c3"),
        sum(col("x1") + col("x2") + col("x3")).as("sr"),
        sum((col("x1") + col("x2") + col("x3"))
          * (col("x1") + col("x2") + col("x3"))).as("sr2"))
      .select(col("n").as("n_orders"), col("c1").as("n_deep_discount"),
        col("c2").as("n_returned"), col("c3").as("n_urgent"),
        expr("CAST(floor(2.0" +
          " * CAST(3 * (c1 * c1 + c2 * c2 + c3 * c3) - sr * sr" +
          " AS DOUBLE) / CAST(3 * sr - sr2 AS DOUBLE) * 1000.0)" +
          " AS BIGINT)").as("q_milli"))
  }

  /** Kendall's τ-b between daily net revenue (dollars) and daily line
    * volume: concordant/discordant/tied pair counts over the
    * calendar-bounded day² dim with the full tie corrections —
    * the rank-dependence number whose sign survives any monotone
    * rescaling of either series. */
  def q654: Q = Q(
    "q654_kendall_tau_daily",
    Some(s"""
      |WITH ${DailyNet.sql.stripPrefix("\n")},
      |vol AS (
      |  SELECT epoch_us(l_shipdate) // 86400000000 AS day,
      |         count(*) AS w
      |  FROM lineitem GROUP BY 1),
      |dv AS (
      |  SELECT d.day,
      |         CAST(floor(CAST(d.net AS DOUBLE) / 100.0) AS BIGINT) AS u,
      |         vol.w
      |  FROM d JOIN vol ON d.day = vol.day),
      |pp AS (
      |  SELECT count(*) FILTER ((b.u - a.u) * (b.w - a.w) > 0) AS c,
      |         count(*) FILTER ((b.u - a.u) * (b.w - a.w) < 0) AS dis,
      |         count(*) FILTER (b.u = a.u) AS tu,
      |         count(*) FILTER (b.w = a.w) AS tw,
      |         count(*) AS n0
      |  FROM dv a JOIN dv b ON b.day > a.day)
      |SELECT CAST((SELECT count(*) FROM dv) AS BIGINT) AS n_days,
      |       CAST(c AS BIGINT) AS concordant,
      |       CAST(dis AS BIGINT) AS discordant,
      |       CAST(floor(CAST(c - dis AS DOUBLE)
      |         / sqrt(CAST(n0 - tu AS DOUBLE))
      |         / sqrt(CAST(n0 - tw AS DOUBLE)) * 1000000.0) AS BIGINT)
      |         AS tau_b_micro
      |FROM pp
      |""".stripMargin)) { (s, dir) =>
    val vol = Tables.lineitem(s, dir)
      .groupBy(expr("unix_micros(CAST(l_shipdate AS TIMESTAMP))" +
        " div 86400000000").as("day"))
      .agg(count(lit(1)).as("w"))
    val dv = DailyNet.frame(s, dir)
      .join(vol.withColumnRenamed("day", "vday"),
        col("day") === col("vday"))
      .select(col("day"),
        expr("CAST(floor(CAST(net AS DOUBLE) / 100.0) AS BIGINT)")
          .as("u"), col("w"))
      .materialize() // the pair join AND the count read it
    val pp = dv.as("a").join(dv.as("b"), col("b.day") > col("a.day"))
      .agg(count(when((col("b.u") - col("a.u"))
        * (col("b.w") - col("a.w")) > 0, 1)).as("c"),
        count(when((col("b.u") - col("a.u"))
          * (col("b.w") - col("a.w")) < 0, 1)).as("dis"),
        count(when(col("b.u") === col("a.u"), 1)).as("tu"),
        count(when(col("b.w") === col("a.w"), 1)).as("tw"),
        count(lit(1)).as("n0"))
    val nn = dv.agg(count(lit(1)).as("n_days"))
    pp.crossJoin(broadcast(nn))
      .select(col("n_days"), col("c").as("concordant"),
        col("dis").as("discordant"),
        expr("CAST(floor(CAST(c - dis AS DOUBLE)" +
          " / sqrt(CAST(n0 - tu AS DOUBLE))" +
          " / sqrt(CAST(n0 - tw AS DOUBLE)) * 1000000.0) AS BIGINT)")
          .as("tau_b_micro"))
  }

  /** Theil's U of the seasonal-naive forecast (month m−12) against
    * the naive benchmark (month m−1) on monthly revenue: U < 1 means
    * seasonality carries real signal beyond persistence. Lags are
    * VALUE joins on the month key (never row lags); squared errors
    * are exact HUGEINT; one pinned sqrt ratio. */
  def q655: Q = Q(
    "q655_theils_u",
    Some("""
      |WITH m AS (
      |  SELECT year(o_orderdate) * 12 + month(o_orderdate) AS mo,
      |         sum(CAST(o_totalprice * 100 AS HUGEINT)) AS v
      |  FROM orders GROUP BY 1),
      |sc AS (
      |  SELECT cur.mo, cur.v, l1.v AS v1, l12.v AS v12
      |  FROM m cur
      |  JOIN m l1 ON l1.mo = cur.mo - 1
      |  JOIN m l12 ON l12.mo = cur.mo - 12),
      |ag AS (
      |  SELECT count(*) AS n,
      |         sum((v - v12) * (v - v12)) AS e_seas,
      |         sum((v - v1) * (v - v1)) AS e_naive
      |  FROM sc)
      |SELECT CAST(n AS BIGINT) AS n_months_scored,
      |       CAST(floor(sqrt(CAST(e_seas AS DOUBLE))
      |         / sqrt(CAST(e_naive AS DOUBLE)) * 1000.0) AS BIGINT)
      |         AS u_milli
      |FROM ag
      |""".stripMargin)) { (s, dir) =>
    val m = Tables.orders(s, dir)
      .groupBy((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .as("mo"))
      .agg(sum(expr("CAST(o_totalprice * 100 AS DECIMAL(38,0))")).as("v"))
      .materialize() // three value-joined readings of the month dim
    val sc = m
      .join(m.select(col("mo").as("m1"), col("v").as("v1")),
        col("m1") === col("mo") - 1)
      .join(m.select(col("mo").as("m12"), col("v").as("v12")),
        col("m12") === col("mo") - 12)
    sc.agg(count(lit(1)).as("n"),
        sum((col("v") - col("v12")) * (col("v") - col("v12")))
          .as("e_seas"),
        sum((col("v") - col("v1")) * (col("v") - col("v1")))
          .as("e_naive"))
      .select(col("n").as("n_months_scored"),
        expr("CAST(floor(sqrt(CAST(e_seas AS DOUBLE))" +
          " / sqrt(CAST(e_naive AS DOUBLE)) * 1000.0) AS BIGINT)")
          .as("u_milli"))
  }
}
