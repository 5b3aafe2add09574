package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Materialize.MatOps

/** Round-9 forecast-evaluation completion wave over the shared
  * [[DailyNet]] series: MASE + sMAPE for the seasonal-naive forecast,
  * the Winkler interval score of an empirical 80% band, exact CRPS of
  * the train empirical CDF, the error-growth curve of the persistence
  * forecast across horizons, and Theil's MSE (bias/variance/
  * covariance) decomposition. The train/test split is fixed-origin at
  * day < 10500 (mid-1998, stated contract); everything lives on the
  * calendar-bounded day dim — pair scans are day², value joins carry
  * the seasonal lags (never row lags), and every score is an exact
  * integer sum with one pinned division. */
object ForecastEvalQueries {

  val all: Seq[Q] = Seq(q696, q697, q698, q699, q700)

  /** Fixed-origin split day (mid-1998 in the epoch-day grain the
    * series uses; both engines state the literal). A def — `val all`
    * above runs the query builders at object init (NOTES.md). */
  private def SplitDay = 10500L

  /** MASE and sMAPE of the seasonal-naive forecast (value at d−7) on
    * the test half: MASE = MAE(forecast) / MAE(in-sample one-step
    * naive), sMAPE = mean 2|e|/(|y|+|ŷ|) — the pair every forecast
    * eval quotes because neither alone survives both scale and
    * near-zero denominators. Exact integer error sums (cents); sMAPE
    * terms ppm-quantized per day before the mean. */
  def q696: Q = Q(
    "q696_mase_smape",
    Some(s"""
      |WITH ${DailyNet.sql.stripPrefix("\n")},
      |f AS (
      |  SELECT a.day, a.net AS y, b.net AS yhat
      |  FROM d a JOIN d b ON b.day = a.day - 7
      |  WHERE a.day >= $SplitDay),
      |ins AS (
      |  SELECT a.net AS y, b.net AS yl
      |  FROM d a JOIN d b ON b.day = a.day - 1
      |  WHERE a.day < $SplitDay),
      |sc AS (SELECT count(*) AS ni, sum(abs(y - yl)) AS sai FROM ins),
      |te AS (
      |  SELECT count(*) AS nt, sum(abs(y - yhat)) AS sae,
      |         sum(CASE WHEN abs(y) + abs(yhat) = 0 THEN 0
      |             ELSE (2000000 * abs(y - yhat))
      |                  // (abs(y) + abs(yhat)) END) AS ssm
      |  FROM f)
      |SELECT CAST(nt AS BIGINT) AS n_test,
      |       CAST(ni AS BIGINT) AS n_insample,
      |       CAST(sae // nt AS BIGINT) AS mae_cents,
      |       CAST(floor(CAST(sae AS DOUBLE) * CAST(ni AS DOUBLE)
      |            / (CAST(nt AS DOUBLE) * CAST(sai AS DOUBLE))
      |            * 1000.0) AS BIGINT) AS mase_milli,
      |       CAST(ssm // nt AS BIGINT) AS smape_ppm
      |FROM sc CROSS JOIN te
      |""".stripMargin)) { (s, dir) =>
    val d = DailyNet.frame(s, dir).materialize()
    val f = d.as("a")
      .join(d.as("b").select(col("day").as("bd"), col("net").as("yhat")),
        col("bd") === col("day") - 7)
      .where(col("day") >= SplitDay)
      .select(col("net").as("y"), col("yhat"))
    val ins = d.as("a")
      .join(d.as("b").select(col("day").as("bd"), col("net").as("yl")),
        col("bd") === col("day") - 1)
      .where(col("day") < SplitDay)
      .select(col("net").as("y"), col("yl"))
    val sc = ins.agg(count(lit(1)).as("ni"),
      sum(abs(col("y") - col("yl"))).as("sai"))
    val te = f.agg(count(lit(1)).as("nt"),
      sum(abs(col("y") - col("yhat"))).as("sae"),
      sum(when(abs(col("y")) + abs(col("yhat")) === 0, lit(0L))
        .otherwise(expr("(2000000 * abs(y - yhat))" +
          " div (abs(y) + abs(yhat))"))).as("ssm"))
    sc.crossJoin(broadcast(te))
      .select(col("nt").as("n_test"), col("ni").as("n_insample"),
        expr("CAST(sae div nt AS BIGINT)").as("mae_cents"),
        expr("""CAST(floor(CAST(sae AS DOUBLE) * CAST(ni AS DOUBLE)
             / (CAST(nt AS DOUBLE) * CAST(sai AS DOUBLE))
             * 1000.0) AS BIGINT)""").as("mase_milli"),
        expr("CAST(ssm div nt AS BIGINT)").as("smape_ppm"))
  }

  /** Winkler score of the TRAIN-empirical 80% interval [p10, p90] as
    * a fixed interval forecast for every test day: width plus
    * 2/α-scaled exceedance penalties (α = 0.2 ⇒ factor 10), exact
    * integers end to end — the proper score that punishes both fat
    * and dishonest intervals. Interval bounds are rank-⌈⌉ order
    * statistics over the train day dim. */
  def q697: Q = Q(
    "q697_winkler_interval",
    Some(s"""
      |WITH ${DailyNet.sql.stripPrefix("\n")},
      |tr AS (SELECT net FROM d WHERE day < $SplitDay),
      |rk AS (SELECT net, row_number() OVER (ORDER BY net) AS r,
      |              count(*) OVER () AS n FROM tr),
      |iv AS (
      |  SELECT max(CASE WHEN r = (100 * n + 999) // 1000 THEN net END)
      |           AS lo,
      |         max(CASE WHEN r = (900 * n + 999) // 1000 THEN net END)
      |           AS hi
      |  FROM rk),
      |te AS (
      |  SELECT count(*) AS nt,
      |         sum(iv.hi - iv.lo
      |           + CASE WHEN d.net < iv.lo THEN 10 * (iv.lo - d.net)
      |                  ELSE 0 END
      |           + CASE WHEN d.net > iv.hi THEN 10 * (d.net - iv.hi)
      |                  ELSE 0 END) AS sw,
      |         sum(CASE WHEN d.net BETWEEN iv.lo AND iv.hi
      |             THEN 1 ELSE 0 END) AS covered
      |  FROM d CROSS JOIN iv WHERE d.day >= $SplitDay)
      |SELECT CAST(nt AS BIGINT) AS n_test,
      |       CAST((SELECT lo FROM iv) AS BIGINT) AS lo_cents,
      |       CAST((SELECT hi FROM iv) AS BIGINT) AS hi_cents,
      |       CAST(covered AS BIGINT) AS n_covered,
      |       CAST(sw // nt AS BIGINT) AS mean_winkler_cents
      |FROM te
      |""".stripMargin)) { (s, dir) =>
    val d = DailyNet.frame(s, dir).materialize()
    val tr = d.where(col("day") < SplitDay)
    val rk = tr.withColumn("r",
        row_number().over(Window.orderBy(col("net")))) // train day dim
      .crossJoin(broadcast(tr.agg(count(lit(1)).as("n"))))
    val iv = rk.agg(
      max(when(col("r") === expr("(100 * n + 999) div 1000"), col("net")))
        .as("lo"),
      max(when(col("r") === expr("(900 * n + 999) div 1000"), col("net")))
        .as("hi"))
    val te = d.where(col("day") >= SplitDay)
      .crossJoin(broadcast(iv))
      .agg(count(lit(1)).as("nt"),
        sum(col("hi") - col("lo")
          + when(col("net") < col("lo"),
            lit(10L) * (col("lo") - col("net"))).otherwise(lit(0L))
          + when(col("net") > col("hi"),
            lit(10L) * (col("net") - col("hi"))).otherwise(lit(0L)))
          .as("sw"),
        sum(when(col("net").between(col("lo"), col("hi")), 1L)
          .otherwise(0L)).as("covered"))
    te.crossJoin(broadcast(iv))
      .select(col("nt").as("n_test"),
        col("lo").cast("long").as("lo_cents"),
        col("hi").cast("long").as("hi_cents"),
        col("covered").as("n_covered"),
        expr("CAST(sw div nt AS BIGINT)").as("mean_winkler_cents"))
  }

  /** EXACT CRPS of the train empirical CDF as a probabilistic
    * forecast: CRPS(F̂, x) = (1/n)Σ|X_i − x| − (1/2n²)Σᵢⱼ|X_i − X_j|,
    * the second term the one-pass rank identity Σ(2r−n−1)x_r (no pair
    * join at all) and the first from a test×train ≤-join — day² rows,
    * calendar-bounded at any fact scale. The proper score that
    * generalizes MAE to distributions. */
  def q698: Q = Q(
    "q698_crps_empirical",
    Some(s"""
      |WITH ${DailyNet.sql.stripPrefix("\n")},
      |tr AS (SELECT net FROM d WHERE day < $SplitDay),
      |rk AS (SELECT net, row_number() OVER (ORDER BY net) AS r,
      |              count(*) OVER () AS n, sum(net) OVER () AS tot
      |       FROM tr),
      |-- Σ|X_i − x| for a test value x: with k = #train ≤ x and s = Σ
      |-- of those, = (k·x − s) + ((tot − s) − (n − k)·x). k and s come
      |-- straight from the ≤-join (a running prefix sum would NOT be
      |-- monotone in rank — net is signed)
      |ks AS (
      |  SELECT t.day, t.net AS x,
      |         count(rk.net) AS k,
      |         coalesce(sum(rk.net), 0) AS s
      |  FROM d t LEFT JOIN rk ON rk.net <= t.net
      |  WHERE t.day >= $SplitDay GROUP BY 1, 2),
      |t1 AS (
      |  SELECT count(*) AS nt,
      |         sum((k * x - s) + ((tot.tot - s) - (tot.n - k) * x))
      |           AS sabs,
      |         max(tot.n) AS n
      |  FROM ks CROSS JOIN (SELECT max(n) AS n, max(tot) AS tot
      |                      FROM rk) tot),
      |t2 AS (
      |  -- Σᵢⱼ|X_i − X_j| over ordered train values via the rank
      |  -- identity Σ (2r − n − 1)·x_r — one pass, no pair join
      |  SELECT sum((2 * r - n - 1) * net) AS spair FROM rk)
      |SELECT CAST(t1.nt AS BIGINT) AS n_test,
      |       CAST(t1.n AS BIGINT) AS n_train,
      |       CAST(t1.sabs // (t1.nt * t1.n) AS BIGINT)
      |         AS mean_absdev_cents,
      |       CAST((2 * t1.n * t1.sabs - t1.nt * t2.spair)
      |            // (2 * t1.nt * CAST(t1.n AS HUGEINT) * t1.n)
      |            AS BIGINT) AS mean_crps_cents
      |FROM t1 CROSS JOIN t2
      |""".stripMargin)) { (s, dir) =>
    val d = DailyNet.frame(s, dir).materialize()
    val tr = d.where(col("day") < SplitDay)
    val rk = tr.select(col("net"))
      .withColumn("r", row_number().over(Window.orderBy(col("net"))))
      .crossJoin(broadcast(tr.agg(count(lit(1)).as("n"),
        sum(col("net")).as("tot"))))
      .materialize() // train day dim: ks probe + pair identity read it
    val ks = d.where(col("day") >= SplitDay)
      .select(col("day"), col("net").as("x"))
      .join(broadcast(rk.select(col("net").as("tn"))),
        col("tn") <= col("x"), "left")
      .groupBy(col("day"), col("x"))
      .agg(count(col("tn")).as("k"),
        coalesce(sum(col("tn")), lit(0L)).as("s"))
    val tot = rk.agg(max(col("n")).as("n"), max(col("tot")).as("tot"))
    val t1 = ks.crossJoin(broadcast(tot))
      .agg(count(lit(1)).as("nt"),
        sum((col("k") * col("x") - col("s"))
          + ((col("tot") - col("s")) - (col("n") - col("k")) * col("x")))
          .as("sabs"),
        max(col("n")).as("n"))
    val t2 = rk.agg(sum((lit(2L) * col("r") - col("n") - 1) * col("net"))
      .as("spair"))
    t1.crossJoin(broadcast(t2))
      .select(col("nt").as("n_test"), col("n").as("n_train"),
        expr("CAST(sabs div (nt * n) AS BIGINT)").as("mean_absdev_cents"),
        expr("CAST((2 * n * sabs - nt * spair)" +
          " div (2 * nt * CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)")
          .as("mean_crps_cents"))
  }

  /** Error-growth curve of the persistence forecast: MAE at horizons
    * 1, 7 and 28 days (value joins on the day dim) and each horizon's
    * ratio to MAE(1) — the random-walk signature is √h growth;
    * flatter means mean reversion, steeper means trend. Exact integer
    * error sums, milli ratios. */
  def q699: Q = Q(
    "q699_error_growth_curve",
    Some(s"""
      |WITH ${DailyNet.sql.stripPrefix("\n")},
      |hz(h) AS (VALUES (1), (7), (28)),
      |e AS (
      |  SELECT hz.h, count(*) AS n, sum(abs(a.net - b.net)) AS sae
      |  FROM d a JOIN hz ON TRUE
      |       JOIN d b ON b.day = a.day - hz.h
      |  GROUP BY 1),
      |base AS (SELECT sae AS s1, n AS n1 FROM e WHERE h = 1)
      |SELECT CAST(e.h AS BIGINT) AS horizon_days,
      |       CAST(e.n AS BIGINT) AS n_pairs,
      |       CAST(e.sae // e.n AS BIGINT) AS mae_cents,
      |       CAST(floor(CAST(e.sae AS DOUBLE) * CAST(base.n1 AS DOUBLE)
      |            / (CAST(e.n AS DOUBLE) * CAST(base.s1 AS DOUBLE))
      |            * 1000.0) AS BIGINT) AS ratio_to_h1_milli
      |FROM e CROSS JOIN base ORDER BY horizon_days
      |""".stripMargin)) { (s, dir) =>
    import s.implicits._
    val d = DailyNet.frame(s, dir).materialize()
    val hz = Seq(1L, 7L, 28L).toDF("h")
    val e = d.as("a").crossJoin(broadcast(hz))
      .join(d.as("b").select(col("day").as("bd"), col("net").as("bn")),
        col("bd") === col("day") - col("h"))
      .groupBy(col("h"))
      .agg(count(lit(1)).as("n"), sum(abs(col("net") - col("bn")))
        .as("sae"))
      .materialize() // 3-row horizon dim
    val base = e.where(col("h") === 1)
      .select(col("sae").as("s1"), col("n").as("n1"))
    e.crossJoin(broadcast(base))
      .select(col("h").as("horizon_days"), col("n").as("n_pairs"),
        expr("CAST(sae div n AS BIGINT)").as("mae_cents"),
        expr("""CAST(floor(CAST(sae AS DOUBLE) * CAST(n1 AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(s1 AS DOUBLE))
             * 1000.0) AS BIGINT)""").as("ratio_to_h1_milli"))
      .orderBy(col("horizon_days"))
  }

  /** Theil's MSE decomposition of the seasonal-naive forecast on the
    * test half: MSE = (ȳ−ŷ̄)² + (σ_y−σ_ŷ)² + 2(1−r)σ_yσ_ŷ, reported
    * as bias/variance/covariance PROPORTIONS (U_M, U_S, U_C, summing
    * to 1 up to quantization) — "is the model wrong on level, spread,
    * or timing". Exact moments, pinned doubles, milli shares. */
  def q700: Q = {
    val n = "CAST(n AS DOUBLE)"
    val my = s"(CAST(sy AS DOUBLE) / $n)"
    val mf = s"(CAST(sf AS DOUBLE) / $n)"
    val vy = s"(CAST(syy AS DOUBLE) / $n - $my * $my)"
    val vf = s"(CAST(sff AS DOUBLE) / $n - $mf * $mf)"
    val cv = s"(CAST(syf AS DOUBLE) / $n - $my * $mf)"
    val mse = s"(CAST(see AS DOUBLE) / $n)"
    val um = s"(($my - $mf) * ($my - $mf) / $mse)"
    val us = s"((sqrt($vy) - sqrt($vf)) * (sqrt($vy) - sqrt($vf)) / $mse)"
    val uc = s"(2.0 * (sqrt($vy) * sqrt($vf) - $cv) / $mse)"
    Q("q700_theil_mse_decomposition",
      Some(s"""
        |WITH ${DailyNet.sql.stripPrefix("\n")},
        |f AS (
        |  SELECT a.net AS y, b.net AS fh
        |  FROM d a JOIN d b ON b.day = a.day - 7
        |  WHERE a.day >= $SplitDay),
        |mo AS (
        |  SELECT count(*) AS n, sum(y) AS sy, sum(fh) AS sf,
        |         sum(y * y) AS syy, sum(fh * fh) AS sff,
        |         sum(y * fh) AS syf,
        |         sum((y - fh) * (y - fh)) AS see
        |  FROM f)
        |SELECT CAST(n AS BIGINT) AS n_test,
        |       CAST(floor(sqrt($mse)) AS BIGINT) AS rmse_cents,
        |       CAST(floor($um * 1000.0) AS BIGINT) AS bias_share_milli,
        |       CAST(floor($us * 1000.0) AS BIGINT) AS var_share_milli,
        |       CAST(floor($uc * 1000.0) AS BIGINT) AS cov_share_milli
        |FROM mo
        |""".stripMargin)) { (s, dir) =>
      val d = DailyNet.frame(s, dir).materialize()
      val f = d.as("a")
        .join(d.as("b").select(col("day").as("bd"), col("net").as("fh")),
          col("bd") === col("day") - 7)
        .where(col("day") >= SplitDay)
        .select(col("net").as("y"), col("fh"))
      f.agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
          sum(col("fh")).as("sf"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("fh") * col("fh")).as("sff"),
          sum(col("y") * col("fh")).as("syf"),
          sum((col("y") - col("fh")) * (col("y") - col("fh"))).as("see"))
        .select(col("n").as("n_test"),
          expr(s"CAST(floor(sqrt($mse)) AS BIGINT)").as("rmse_cents"),
          expr(s"CAST(floor($um * 1000.0) AS BIGINT)")
            .as("bias_share_milli"),
          expr(s"CAST(floor($us * 1000.0) AS BIGINT)")
            .as("var_share_milli"),
          expr(s"CAST(floor($uc * 1000.0) AS BIGINT)")
            .as("cov_share_milli"))
    }
  }
}
