package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Materialize.MatOps
import graft.Tables

/** Round-9 market-microstructure wave on the daily shipped-goods
  * "market": one fact pass builds the day-grain VWAP (milli-dollar
  * unit price, exact integer) + dollar volume + return-flag order-flow
  * imbalance; the five classics then run on the ≤2.5k-day calendar
  * dim: Roll's implied effective spread from the negative serial
  * covariance of price changes, Amihud's illiquidity ratio by year,
  * Kyle's λ (price impact per signed unit of flow), the Lo-MacKinlay
  * variance ratio VR(5), and the realized-variance signature curve at
  * sampling gaps 1/2/5/10/21 days.
  *
  * Scale: the day dim is CALENDAR-bounded (~2.5k rows at every sf), so
  * the single-partition row_number window and the tiny lag self-joins
  * are constant-size forever; only the day-grain groupBy touches the
  * fact table. Price changes are computed on consecutive OBSERVED
  * days (gap days splice, documented); deltas use plain differences of
  * the integer milli VWAP, not log returns, so every sum is exact
  * (DECIMAL(38,0) / HUGEINT) and each statistic is one pinned double. */
object MicrostructureQueries {

  val all: Seq[Q] = Seq(q786, q787, q788, q789, q790)

  private def sqlPx: String = """
    |day AS (
    |  SELECT CAST(l_shipdate AS DATE) AS d,
    |         sum(CAST(l_extendedprice * 100 AS BIGINT)) AS vol,
    |         sum(CAST(l_quantity AS BIGINT)) AS qty,
    |         sum(CASE WHEN l_returnflag = 'N'
    |                    THEN CAST(l_quantity AS BIGINT)
    |                  WHEN l_returnflag = 'R'
    |                    THEN -CAST(l_quantity AS BIGINT)
    |                  ELSE 0 END) AS sq
    |  FROM lineitem GROUP BY 1),
    |px AS (
    |  SELECT row_number() OVER (ORDER BY d) AS t, d,
    |         (10 * vol) // qty AS p, vol, sq
    |  FROM day)""".stripMargin

  /** Day-grain price panel (t, d, p, vol, sq): t the dense time index,
    * p the milli-dollar VWAP, vol cents, sq signed flow. */
  private def pxBase(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_shipdate").cast("date").as("d"),
        expr("CAST(CAST(l_extendedprice * 100 AS DECIMAL(38,0)) AS LONG)")
          .as("v"),
        col("l_quantity").cast("long").as("q"),
        when(col("l_returnflag") === "N", col("l_quantity").cast("long"))
          .when(col("l_returnflag") === "R", -col("l_quantity").cast("long"))
          .otherwise(lit(0L)).as("sgn"))
      .groupBy(col("d"))
      .agg(sum(col("v")).as("vol"), sum(col("q")).as("qty"),
        sum(col("sgn")).as("sq"))
      .select(row_number().over(Window.orderBy(col("d"))).as("t"),
        col("d"), expr("(10 * vol) div qty").as("p"), col("vol"), col("sq"))

  /** Consecutive-day deltas (t, x = p_{t+1} − p_t, plus next-day vol /
    * flow / year for the queries that need the same-step covariates). */
  private def dxBase(px: DataFrame): DataFrame = {
    val a = px.select(col("t"), col("p"))
    val b = px.select((col("t") - 1).as("tb"), col("p").as("pb"),
      col("vol").as("volb"), col("sq").as("sqb"), col("d").as("db"))
    a.join(b, col("t") === col("tb"))
      .select(col("t"), col("p"), (col("pb") - col("p")).as("x"),
        col("volb"), col("sqb"), year(col("db")).as("yr"))
  }

  /** Roll (1984) implied spread: sample serial covariance of
    * consecutive price changes; spread = 2·√(−cov) when negative. */
  def q786: Q = Q(
    "q786_roll_spread",
    Some(s"""
      |WITH ${sqlPx},
      |dx AS (
      |  SELECT a.t, CAST(b.p - a.p AS HUGEINT) AS x
      |  FROM px a JOIN px b ON b.t = a.t + 1),
      |pr AS (
      |  SELECT a.x AS x, b.x AS y
      |  FROM dx a JOIN dx b ON b.t = a.t + 1),
      |mo AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
      |              sum(x * y) AS sxy FROM pr)
      |SELECT CAST(n AS BIGINT) AS n_pairs,
      |       CAST((n * sxy - sx * sy) // 1000000 AS BIGINT)
      |         AS acov_num_k,
      |       CASE WHEN n * sxy - sx * sy < 0 THEN
      |         CAST(floor(2.0 * sqrt(
      |           CAST(-(n * sxy - sx * sy) AS DOUBLE)
      |           / (CAST(n AS DOUBLE) * (n - 1)))) AS BIGINT)
      |       ELSE NULL END AS roll_spread_milli
      |FROM mo
      |""".stripMargin)) { (s, dir) =>
    val dx = dxBase(pxBase(s, dir))
      .select(col("t"), col("x").cast("decimal(38,0)").as("x"))
    val pr = dx.join(
      dx.select((col("t") - 1).as("tb"), col("x").as("y")),
      col("t") === col("tb"))
    pr.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"))
      .select(col("n").cast("long").as("n_pairs"),
        expr("CAST((n * sxy - sx * sy) div 1000000 AS BIGINT)")
          .as("acov_num_k"),
        expr("""CASE WHEN n * sxy - sx * sy < 0 THEN
          |  CAST(floor(2.0 * sqrt(
          |    CAST(-(n * sxy - sx * sy) AS DOUBLE)
          |    / (CAST(n AS DOUBLE) * (n - 1)))) AS BIGINT)
          |ELSE NULL END""".stripMargin).as("roll_spread_milli"))
  }

  /** Amihud (2002) illiquidity by year: daily |return|/dollar-volume
    * (×10⁹, return in micro), yearly mean — exact nested integer
    * divisions, truncation identical in both engines. */
  def q787: Q = Q(
    "q787_amihud_illiquidity",
    Some(s"""
      |WITH ${sqlPx},
      |dx AS (
      |  SELECT year(b.d) AS yr,
      |         (1000000000 * ((1000000 * abs(b.p - a.p)) // a.p))
      |           // b.vol AS il
      |  FROM px a JOIN px b ON b.t = a.t + 1)
      |SELECT CAST(yr AS BIGINT) AS yr,
      |       CAST(count(*) AS BIGINT) AS n_days,
      |       CAST(sum(il) // count(*) AS BIGINT) AS amihud_mean_e9
      |FROM dx GROUP BY yr ORDER BY yr
      |""".stripMargin)) { (s, dir) =>
    dxBase(pxBase(s, dir))
      .select(col("yr"),
        expr("(1000000000 * ((1000000 * abs(x)) div p)) div volb").as("il"))
      .groupBy(col("yr"))
      .agg(count(lit(1)).as("n"), sum(col("il").cast("decimal(38,0)")).as("si"))
      .select(col("yr").cast("long").as("yr"),
        col("n").cast("long").as("n_days"),
        expr("CAST((si - si % n) / n AS DECIMAL(38,0))").cast("long")
          .as("amihud_mean_e9"))
      .orderBy(col("yr"))
  }

  /** Kyle's λ: OLS slope of the day's price change on the same day's
    * signed order flow (N-flagged minus R-flagged quantity). Exact
    * integer normal-equation terms, one pinned double. */
  def q788: Q = Q(
    "q788_kyle_lambda",
    Some(s"""
      |WITH ${sqlPx},
      |dx AS (
      |  SELECT CAST(b.p - a.p AS HUGEINT) AS y,
      |         CAST(b.sq AS HUGEINT) AS x
      |  FROM px a JOIN px b ON b.t = a.t + 1),
      |mo AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
      |              sum(x * y) AS sxy, sum(x * x) AS sxx FROM dx)
      |SELECT CAST(n AS BIGINT) AS n_days,
      |       CAST(n * sxy - sx * sy AS BIGINT) AS num,
      |       CAST(n * sxx - sx * sx AS BIGINT) AS den,
      |       CAST(floor(1000.0 * CAST(n * sxy - sx * sy AS DOUBLE)
      |            / CAST(n * sxx - sx * sx AS DOUBLE)) AS BIGINT)
      |         AS kyle_lambda_micro
      |FROM mo
      |""".stripMargin)) { (s, dir) =>
    dxBase(pxBase(s, dir))
      .select(col("x").cast("decimal(38,0)").as("y"),
        col("sqb").cast("decimal(38,0)").as("x"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("n").cast("long").as("n_days"),
        expr("CAST(n * sxy - sx * sy AS BIGINT)").as("num"),
        expr("CAST(n * sxx - sx * sx AS BIGINT)").as("den"),
        expr("""CAST(floor(1000.0 * CAST(n * sxy - sx * sy AS DOUBLE)
          |  / CAST(n * sxx - sx * sx AS DOUBLE)) AS BIGINT)"""
          .stripMargin).as("kyle_lambda_micro"))
  }

  /** Lo-MacKinlay variance ratio VR(5) on price differences
    * (overlapping 5-step spans over the day index): the 5-step
    * per-step variance over the 1-step variance, milli-quantized.
    * VR < 1 ⇒ mean reversion. */
  def q789: Q = Q(
    "q789_variance_ratio_5",
    Some(s"""
      |WITH ${sqlPx},
      |dx AS (SELECT a.t, CAST(b.p - a.p AS HUGEINT) AS x
      |       FROM px a JOIN px b ON b.t = a.t + 1),
      |qx AS (SELECT a.t, CAST(b.p - a.p AS HUGEINT) AS y
      |       FROM px a JOIN px b ON b.t = a.t + 5),
      |m1 AS (SELECT count(*) AS m, sum(x) AS sx, sum(x * x) AS sxx FROM dx),
      |m5 AS (SELECT count(*) AS k, sum(y) AS sy, sum(y * y) AS syy FROM qx)
      |SELECT CAST(m1.m AS BIGINT) AS n_1d, CAST(m5.k AS BIGINT) AS n_5d,
      |       CAST(floor(1000.0 *
      |         ((CAST(m5.syy AS DOUBLE)
      |           - 2.0 * 5.0 * CAST(m5.sy AS DOUBLE)
      |             * CAST(m1.sx AS DOUBLE) / m1.m
      |           + m5.k * 25.0 * (CAST(m1.sx AS DOUBLE) / m1.m)
      |             * (CAST(m1.sx AS DOUBLE) / m1.m)) / (5.0 * m5.k))
      |         / ((CAST(m1.sxx AS DOUBLE)
      |             - CAST(m1.sx AS DOUBLE) * CAST(m1.sx AS DOUBLE) / m1.m)
      |            / m1.m)) AS BIGINT) AS vr5_milli
      |FROM m1 CROSS JOIN m5
      |""".stripMargin)) { (s, dir) =>
    val px = pxBase(s, dir).materialize()
    def spans(h: Int): DataFrame = {
      val b = px.select((col("t") - h).as("tb"), col("p").as("pb"))
      px.join(b, col("t") === col("tb"))
        .select((col("pb") - col("p")).cast("decimal(38,0)").as("z"))
    }
    val m1 = spans(1).agg(count(lit(1)).as("m"), sum(col("z")).as("sx"),
      sum(col("z") * col("z")).as("sxx"))
    val m5 = spans(5).agg(count(lit(1)).as("k"), sum(col("z")).as("sy"),
      sum(col("z") * col("z")).as("syy"))
    m1.crossJoin(broadcast(m5))
      .select(col("m").cast("long").as("n_1d"),
        col("k").cast("long").as("n_5d"),
        expr("""CAST(floor(1000.0 *
          |  ((CAST(syy AS DOUBLE)
          |    - 2.0 * 5.0 * CAST(sy AS DOUBLE) * CAST(sx AS DOUBLE) / m
          |    + k * 25.0 * (CAST(sx AS DOUBLE) / m)
          |      * (CAST(sx AS DOUBLE) / m)) / (5.0 * k))
          |  / ((CAST(sxx AS DOUBLE)
          |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / m) / m))
          |  AS BIGINT)""".stripMargin).as("vr5_milli"))
  }

  /** Realized-variance signature curve: non-overlapping h-day sampled
    * squared increments per step, h ∈ {1,2,5,10,21} — microstructure
    * noise shows as RV(1) ≫ RV(21)/step. */
  def q790: Q = Q(
    "q790_rv_signature",
    Some(s"""
      |WITH ${sqlPx},
      |hh AS (SELECT * FROM (VALUES (1),(2),(5),(10),(21)) AS v(h)),
      |inc AS (
      |  SELECT hh.h, CAST(b.p - a.p AS HUGEINT) AS dlt
      |  FROM hh JOIN px a ON (a.t - 1) % hh.h = 0
      |       JOIN px b ON b.t = a.t + hh.h)
      |SELECT CAST(h AS BIGINT) AS h,
      |       CAST(count(*) AS BIGINT) AS n_incr,
      |       CAST(sum(dlt * dlt) // (count(*) * h) AS BIGINT)
      |         AS rv_per_step
      |FROM inc GROUP BY h ORDER BY h
      |""".stripMargin)) { (s, dir) =>
    val px = pxBase(s, dir).materialize()
    val hh = px.sparkSession.range(1).select(
      explode(array(lit(1), lit(2), lit(5), lit(10), lit(21))).as("h"))
    val b = px.select(col("t").as("t2"), col("p").as("pb"))
    broadcast(hh).join(px, (col("t") - 1) % col("h") === 0)
      .join(b, col("t2") === col("t") + col("h"))
      .select(col("h"), (col("pb") - col("p")).cast("decimal(38,0)").as("dlt"))
      .groupBy(col("h"))
      .agg(count(lit(1)).as("n"), sum(col("dlt") * col("dlt")).as("sdd"))
      .select(col("h").cast("long").as("h"),
        col("n").cast("long").as("n_incr"),
        expr("CAST((sdd - sdd % (n * h)) / (n * h) AS DECIMAL(38,0))")
          .cast("long").as("rv_per_step"))
      .orderBy(col("h"))
  }
}
