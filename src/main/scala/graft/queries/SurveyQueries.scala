package graft.queries

import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables

/** Round-9 survey-estimation wave: the expansion/ratio/regression
  * estimator trio on a deterministic systematic sample,
  * post-stratification by order priority, capture–recapture population
  * estimates, the design effect of month-cluster sampling, and
  * Tukey's trimean/midhinge from bucket-parallel quartiles. Samples
  * are key-systematic (orderkey mod k — deterministic, both engines
  * state the same membership), every estimator is exact moments + one
  * pinned double, and the only fact-scaled rank rides globalRankCum. */
object SurveyQueries {

  val all: Seq[Q] = Seq(q681, q682, q683, q684, q685)

  /** Order frame shared by the estimator faces: y = order cents,
    * x = total line quantity (the auxiliary with a known population
    * total). */
  private def sqlOx: String =
    """ox AS (
      |  SELECT o.o_orderkey AS ok, o.o_orderpriority AS pr,
      |         CAST(sum(CAST(o.o_totalprice * 100 AS HUGEINT))
      |              // count(*) AS BIGINT) AS y,
      |         sum(CAST(floor(l.l_quantity + 0.5) AS BIGINT)) AS x
      |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |  GROUP BY 1, 2)""".stripMargin

  private def oxSpark(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.orders(s, dir)
      .select(col("o_orderkey").as("ok"), col("o_orderpriority").as("pr"),
        expr("CAST(o_totalprice * 100 AS DECIMAL(38,0))").as("yc"))
      .join(Tables.lineitem(s, dir)
        .select(col("l_orderkey"),
          expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").as("q")),
        col("ok") === col("l_orderkey"))
      .groupBy(col("ok"), col("pr"))
      .agg(expr("CAST(sum(yc) div count(1) AS BIGINT)").as("y"),
        sum(col("q")).as("x"))

  /** Expansion vs ratio vs regression estimators of TOTAL revenue from
    * a 1-in-20 key-systematic order sample, against the known truth:
    * Ŷ_exp = 20·Σy_s, Ŷ_ratio = X_true·Σy_s/Σx_s,
    * Ŷ_reg = N·(ȳ_s + b·(X̄ − x̄_s)) with the OLS b from exact sample
    * moments — the textbook ranking (regression ≤ ratio ≤ expansion
    * variance when y correlates with x) made measurable. Signed errors
    * in cents, floor-quantized through one shared text. */
  def q681: Q = {
    val b = "((CAST(ns AS DOUBLE) * CAST(sxy AS DOUBLE)" +
      " - CAST(sxs AS DOUBLE) * CAST(sys AS DOUBLE))" +
      " / (CAST(ns AS DOUBLE) * CAST(sxx AS DOUBLE)" +
      " - CAST(sxs AS DOUBLE) * CAST(sxs AS DOUBLE)))"
    val yReg = s"(CAST(np AS DOUBLE) * (CAST(sys AS DOUBLE)" +
      s" / CAST(ns AS DOUBLE) + $b * (CAST(xt AS DOUBLE)" +
      s" / CAST(np AS DOUBLE) - CAST(sxs AS DOUBLE) / CAST(ns AS DOUBLE))))"
    val yRatio = "(CAST(xt AS DOUBLE) * CAST(sys AS DOUBLE)" +
      " / CAST(sxs AS DOUBLE))"
    Q("q681_estimator_trio",
      Some(s"""
        |WITH ${sqlOx},
        |pop AS (SELECT count(*) AS np, sum(y) AS yt, sum(x) AS xt
        |        FROM ox),
        |smp AS (
        |  SELECT count(*) AS ns, sum(y) AS sys, sum(x) AS sxs,
        |         sum(CAST(x AS HUGEINT) * y) AS sxy,
        |         sum(CAST(x AS HUGEINT) * x) AS sxx
        |  FROM ox WHERE ok % 20 = 0)
        |SELECT CAST(np AS BIGINT) AS n_pop,
        |       CAST(ns AS BIGINT) AS n_sample,
        |       CAST(yt AS BIGINT) AS y_true_cents,
        |       CAST(20 * sys - yt AS BIGINT) AS err_expansion_cents,
        |       CAST(floor($yRatio) - yt AS BIGINT) AS err_ratio_cents,
        |       CAST(floor($yReg) - yt AS BIGINT) AS err_reg_cents
        |FROM pop CROSS JOIN smp
        |""".stripMargin)) { (s, dir) =>
      val ox = oxSpark(s, dir).materialize()
      val pop = ox.agg(count(lit(1)).as("np"), sum(col("y")).as("yt"),
        sum(col("x")).as("xt"))
      val smp = ox.where(pmod(col("ok"), lit(20L)) === 0)
        .agg(count(lit(1)).as("ns"), sum(col("y")).as("sys"),
          sum(col("x")).as("sxs"),
          sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"),
          sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"))
      pop.crossJoin(broadcast(smp))
        .select(col("np").as("n_pop"), col("ns").as("n_sample"),
          col("yt").as("y_true_cents"),
          expr("CAST(20 * sys - yt AS BIGINT)").as("err_expansion_cents"),
          expr(s"CAST(floor($yRatio) - yt AS BIGINT)")
            .as("err_ratio_cents"),
          expr(s"CAST(floor($yReg) - yt AS BIGINT)").as("err_reg_cents"))
    }
  }

  /** Post-stratification by order priority: the plain sample mean vs
    * the post-stratified Σ_h (N_h/N)·ȳ_h over the same 1-in-20
    * systematic sample, signed errors against the true mean in
    * milli-cents. The estimator survey pipelines reach for when the
    * frame has known stratum counts but sampling ignored them. */
  def q682: Q = {
    val mTrue = "(CAST(yt AS DOUBLE) / CAST(np AS DOUBLE))"
    Q("q682_post_stratification",
      Some(s"""
        |WITH ${sqlOx},
        |ph AS (SELECT pr, count(*) AS nh FROM ox GROUP BY 1),
        |sh AS (SELECT pr, count(*) AS nsh, sum(y) AS ysh
        |       FROM ox WHERE ok % 20 = 0 GROUP BY 1),
        |pop AS (SELECT count(*) AS np, sum(y) AS yt FROM ox),
        |ps AS (
        |  -- per-stratum contribution to the post-stratified MEAN,
        |  -- milli-quantized BEFORE the cross-stratum sum (a raw double
        |  -- sum over group rows is accumulation-order-sensitive)
        |  SELECT sum(CAST(floor(CAST(ph.nh AS DOUBLE)
        |           * CAST(sh.ysh AS DOUBLE) / CAST(sh.nsh AS DOUBLE)
        |           / CAST(pop.np AS DOUBLE) * 1000.0) AS BIGINT))
        |           AS psmilli
        |  FROM ph JOIN sh ON sh.pr = ph.pr CROSS JOIN pop),
        |smp AS (SELECT count(*) AS ns, sum(y) AS sys FROM ox
        |        WHERE ok % 20 = 0)
        |SELECT CAST(np AS BIGINT) AS n_pop,
        |       CAST(ns AS BIGINT) AS n_sample,
        |       CAST(floor($mTrue * 1000.0) AS BIGINT) AS mean_true_milli,
        |       CAST(floor((CAST(sys AS DOUBLE) / CAST(ns AS DOUBLE)
        |            - $mTrue) * 1000.0) AS BIGINT) AS err_plain_milli,
        |       CAST(ps.psmilli - floor($mTrue * 1000.0) AS BIGINT)
        |         AS err_poststrat_milli
        |FROM pop CROSS JOIN smp CROSS JOIN ps
        |""".stripMargin)) { (s, dir) =>
      val ox = oxSpark(s, dir).materialize()
      val ph = ox.groupBy(col("pr")).agg(count(lit(1)).as("nh"))
      val sh = ox.where(pmod(col("ok"), lit(20L)) === 0)
        .groupBy(col("pr"))
        .agg(count(lit(1)).as("nsh"), sum(col("y")).as("ysh"))
      val pop = ox.agg(count(lit(1)).as("np"), sum(col("y")).as("yt"))
      val ps = ph.join(sh, Seq("pr")).crossJoin(broadcast(pop))
        .agg(sum(expr("CAST(floor(CAST(nh AS DOUBLE)" +
          " * CAST(ysh AS DOUBLE) / CAST(nsh AS DOUBLE)" +
          " / CAST(np AS DOUBLE) * 1000.0) AS BIGINT)")).as("psmilli"))
      val smp = ox.where(pmod(col("ok"), lit(20L)) === 0)
        .agg(count(lit(1)).as("ns"), sum(col("y")).as("sys"))
      pop.crossJoin(broadcast(smp)).crossJoin(broadcast(ps))
        .select(col("np").as("n_pop"), col("ns").as("n_sample"),
          expr(s"CAST(floor($mTrue * 1000.0) AS BIGINT)")
            .as("mean_true_milli"),
          expr(s"CAST(floor((CAST(sys AS DOUBLE) / CAST(ns AS DOUBLE)" +
            s" - $mTrue) * 1000.0) AS BIGINT)").as("err_plain_milli"),
          expr(s"CAST(psmilli - floor($mTrue * 1000.0) AS BIGINT)")
            .as("err_poststrat_milli"))
    }
  }

  /** Capture–recapture population estimation against KNOWN truth:
    * two deterministic "captures" of the ordering-customer population
    * (custkey mod 7 / mod 11 — independent-ish by construction),
    * Lincoln–Petersen n₁n₂/m and the bias-corrected Chapman
    * (n₁+1)(n₂+1)/(m+1) − 1, with signed errors. The mark-recapture
    * estimator every "how big is the hidden population" audit uses,
    * here with the luxury of a ground truth. */
  def q683: Q = Q(
    "q683_capture_recapture",
    Some("""
      |WITH cust AS (SELECT DISTINCT o_custkey AS ck FROM orders),
      |mo AS (
      |  SELECT count(*) AS nt,
      |         sum(CASE WHEN ck % 7 = 0 THEN 1 ELSE 0 END) AS n1,
      |         sum(CASE WHEN ck % 11 = 0 THEN 1 ELSE 0 END) AS n2,
      |         sum(CASE WHEN ck % 7 = 0 AND ck % 11 = 0 THEN 1 ELSE 0 END)
      |           AS m
      |  FROM cust)
      |SELECT CAST(nt AS BIGINT) AS true_n,
      |       CAST(n1 AS BIGINT) AS n_capture1,
      |       CAST(n2 AS BIGINT) AS n_capture2,
      |       CAST(m AS BIGINT) AS n_marked,
      |       CAST(CASE WHEN m = 0 THEN NULL
      |            ELSE (n1 * n2) // m END AS BIGINT) AS lincoln_petersen,
      |       CAST((n1 + 1) * (n2 + 1) // (m + 1) - 1 AS BIGINT)
      |         AS chapman,
      |       CAST((n1 + 1) * (n2 + 1) // (m + 1) - 1 - nt AS BIGINT)
      |         AS err_chapman
      |FROM mo
      |""".stripMargin)) { (s, dir) =>
    Tables.orders(s, dir).select(col("o_custkey").as("ck")).distinct()
      .agg(count(lit(1)).as("nt"),
        sum(when(pmod(col("ck"), lit(7L)) === 0, 1L).otherwise(0L))
          .as("n1"),
        sum(when(pmod(col("ck"), lit(11L)) === 0, 1L).otherwise(0L))
          .as("n2"),
        sum(when(pmod(col("ck"), lit(7L)) === 0 &&
          pmod(col("ck"), lit(11L)) === 0, 1L).otherwise(0L)).as("m"))
      .select(col("nt").as("true_n"), col("n1").as("n_capture1"),
        col("n2").as("n_capture2"), col("m").as("n_marked"),
        expr("CAST(CASE WHEN m = 0 THEN NULL" +
          " ELSE (n1 * n2) div m END AS BIGINT)").as("lincoln_petersen"),
        expr("CAST((n1 + 1) * (n2 + 1) div (m + 1) - 1 AS BIGINT)")
          .as("chapman"),
        expr("CAST((n1 + 1) * (n2 + 1) div (m + 1) - 1 - nt AS BIGINT)")
          .as("err_chapman"))
  }

  /** Design effect of month-cluster sampling: the intraclass
    * correlation of order value within order-months (one-way ANOVA
    * components from exact moments) and DEFF = 1 + (m̄−1)·ICC — "how
    * much information does sampling whole months throw away". All
    * sums exact decimal; ICC/DEFF one pinned double each. */
  def q684: Q = {
    val msb = "((CAST(sb AS DOUBLE) - CAST(sy AS DOUBLE)" +
      " * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))" +
      " / (CAST(k AS DOUBLE) - 1.0))"
    val msw = "((CAST(syy AS DOUBLE) - CAST(sb AS DOUBLE))" +
      " / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)))"
    val mbar = "(CAST(n AS DOUBLE) / CAST(k AS DOUBLE))"
    val icc = s"(($msb - $msw) / ($msb + ($mbar - 1.0) * $msw))"
    Q("q684_design_effect",
      Some(s"""
        |WITH oy AS (
        |  SELECT year(o_orderdate) * 12 + month(o_orderdate) AS mo,
        |         CAST(o_totalprice * 100 AS HUGEINT) AS y
        |  FROM orders),
        |cm AS (SELECT mo, count(*) AS nc, sum(y) AS sc,
        |              sum(y * y) AS qc FROM oy GROUP BY 1),
        |mo2 AS (
        |  -- per-cluster sc²/nc floors to an exact integer BEFORE the
        |  -- cross-cluster sum (raw double accumulation is order-
        |  -- sensitive); positive, so // ≡ div
        |  SELECT count(*) AS k, sum(nc) AS n, sum(sc) AS sy,
        |         sum(qc) AS syy,
        |         sum((sc * sc) // nc) AS sb
        |  FROM cm)
        |SELECT CAST(k AS BIGINT) AS k_clusters,
        |       CAST(n AS BIGINT) AS n_orders,
        |       CAST(floor($mbar * 1000.0) AS BIGINT) AS mbar_milli,
        |       CAST(floor($icc * 1000000.0) AS BIGINT) AS icc_micro,
        |       CAST(floor((1.0 + ($mbar - 1.0) * $icc) * 1000.0)
        |            AS BIGINT) AS deff_milli
        |FROM mo2
        |""".stripMargin)) { (s, dir) =>
      val oy = Tables.orders(s, dir)
        .select((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .as("mo"),
          expr("CAST(o_totalprice * 100 AS DECIMAL(38,0))").as("y"))
      val cm = oy.groupBy(col("mo"))
        .agg(count(lit(1)).as("nc"), sum(col("y")).as("sc"),
          sum(col("y") * col("y")).as("qc"))
      cm.agg(count(lit(1)).as("k"), sum(col("nc")).as("n"),
          sum(col("sc")).as("sy"), sum(col("qc")).as("syy"),
          sum(expr("CAST((sc * sc) div nc AS DECIMAL(38,0))")).as("sb"))
        .select(col("k").as("k_clusters"), col("n").as("n_orders"),
          expr(s"CAST(floor($mbar * 1000.0) AS BIGINT)").as("mbar_milli"),
          expr(s"CAST(floor($icc * 1000000.0) AS BIGINT)").as("icc_micro"),
          expr(s"CAST(floor((1.0 + ($mbar - 1.0) * $icc) * 1000.0)" +
            " AS BIGINT)").as("deff_milli"))
    }
  }

  /** Tukey's trimean (Q1 + 2·Q2 + Q3)/4 and midhinge (Q1 + Q3)/2 of
    * order value — the robust-location pair a reporting layer quotes
    * when the mean is tail-dominated. Quartiles are rank-⌈p·n/1000⌉
    * order statistics over the bucket-parallel globalRankCum (order
    * values are near-unique, so a value-histogram walk would be
    * row-sized — the rank path is the scale-safe one here). */
  def q685: Q = Q(
    "q685_trimean_midhinge",
    Some("""
      |WITH oy AS (
      |  SELECT o_orderkey AS ok,
      |         CAST(CAST(o_totalprice * 100 AS HUGEINT) AS BIGINT) AS y
      |  FROM orders),
      |rk AS (SELECT y, row_number() OVER (ORDER BY y, ok) AS r,
      |              count(*) OVER () AS n FROM oy),
      |qs AS (
      |  SELECT max(CASE WHEN r = (250 * n + 999) // 1000 THEN y END)
      |           AS q1,
      |         max(CASE WHEN r = (500 * n + 999) // 1000 THEN y END)
      |           AS q2,
      |         max(CASE WHEN r = (750 * n + 999) // 1000 THEN y END)
      |           AS q3,
      |         max(n) AS n
      |  FROM rk)
      |SELECT CAST(n AS BIGINT) AS n_orders,
      |       CAST(q1 AS BIGINT) AS q1_cents,
      |       CAST(q2 AS BIGINT) AS q2_cents,
      |       CAST(q3 AS BIGINT) AS q3_cents,
      |       CAST((1000 * (q1 + 2 * q2 + q3)) // 4 AS BIGINT)
      |         AS trimean_millicents,
      |       CAST((1000 * (q1 + q3)) // 2 AS BIGINT)
      |         AS midhinge_millicents,
      |       CAST(q3 - q1 AS BIGINT) AS iqr_cents
      |FROM qs
      |""".stripMargin)) { (s, dir) =>
    val oy = Tables.orders(s, dir)
      .select(col("o_orderkey").as("ok"),
        expr("CAST(CAST(o_totalprice * 100 AS DECIMAL(38,0)) AS BIGINT)")
          .as("y"))
    val n1 = oy.agg(count(lit(1)).as("n"))
    val rk = graft.dedup.SortedNeighborhood.globalRankCum(
        oy.withColumn("__bkt", expr("y div 1048576")),
        idCol = "ok", bucketCol = "__bkt", tieCols = Seq("y"),
        partCols = Nil, cumCol = None)
      .crossJoin(broadcast(n1))
    rk.agg(
        max(when(col("__rank") === expr("(250 * n + 999) div 1000"),
          col("y"))).as("q1"),
        max(when(col("__rank") === expr("(500 * n + 999) div 1000"),
          col("y"))).as("q2"),
        max(when(col("__rank") === expr("(750 * n + 999) div 1000"),
          col("y"))).as("q3"),
        max(col("n")).as("n"))
      .select(col("n").as("n_orders"), col("q1").as("q1_cents"),
        col("q2").as("q2_cents"), col("q3").as("q3_cents"),
        expr("(1000 * (q1 + 2 * q2 + q3)) div 4").as("trimean_millicents"),
        expr("(1000 * (q1 + q3)) div 2").as("midhinge_millicents"),
        (col("q3") - col("q1")).as("iqr_cents"))
  }
}
