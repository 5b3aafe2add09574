package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps

/** Round-9 classical-smoother wave over the daily-net series:
  * Nadaraya–Watson kernel regression on a fixed index grid, Tukey's
  * 53H compound median smoother, the Hampel outlier filter, and the
  * Henderson 13-term and Savitzky–Golay 11-term moving averages whose
  * weights are EXACT RATIONALS (integer numerators from the closed
  * forms, one shared denominator) — so every smoothed value is exact
  * integer arithmetic. The NW kernel weights are the one irrational
  * ingredient and are nano-quantized PER (grid, day) TERM before the
  * sums. Day dim only; windows are full-coverage (edges excluded by
  * contract). */
object SmootherQueries {

  val all: Seq[Q] = Seq(q736, q737, q738, q739, q740)

  /** Oracle CTE `o(t, day, y)` — y = whole-dollar daily net. */
  private def sqlO: String = DailyNet.sql + """,
    |o AS (
    |  SELECT row_number() OVER (ORDER BY day) AS t, day,
    |         CAST(net // 100 AS BIGINT) AS y
    |  FROM d)""".stripMargin

  private def o(s: SparkSession, dir: String): DataFrame =
    DailyNet.frame(s, dir)
      .select(col("day"), expr("CAST(net div 100 AS BIGINT)").as("y"))
      .withColumn("t", row_number().over(Window.orderBy(col("day"))))

  /** Nadaraya–Watson Gaussian kernel regression (h = 30 index steps)
    * at every 100th day index: each kernel weight is exp(−(t−g)²/2h²)
    * nano-quantized per term, then NW(g) = Σwy // Σw exactly. The
    * grid×days pair frame is calendar-bounded (≤25×2500). */
  def q736: Q = Q(
    "q736_nadaraya_watson",
    Some(s"""
      |WITH ${sqlO},
      |nn AS (SELECT max(t) AS n FROM o),
      |gr AS (SELECT unnest(range(100, (SELECT n FROM nn) + 1, 100))
      |         AS g),
      |tw AS (
      |  SELECT gr.g, o.y,
      |         CAST(floor(exp(-(CAST(o.t - gr.g AS DOUBLE)
      |              * (o.t - gr.g)) / 1800.0) * 1000000000.0)
      |              AS BIGINT) AS w
      |  FROM gr CROSS JOIN o)
      |SELECT CAST(g AS BIGINT) AS grid_t,
      |       CAST(sum(CAST(w AS HUGEINT) * y) // sum(w) AS BIGINT)
      |         AS nw_dollars,
      |       CAST(sum(w) // 1000000000 AS BIGINT) AS eff_weight
      |FROM tw GROUP BY g ORDER BY grid_t
      |""".stripMargin)) { (s, dir) =>
    val ob = o(s, dir).materialize()
    val gr = ob.agg(max(col("t")).as("n"))
      .select(explode(sequence(lit(100L), col("n"), lit(100L))).as("g"))
    gr.crossJoin(ob)
      .select(col("g"), col("y"),
        expr("CAST(floor(exp(-(CAST(t - g AS DOUBLE) * (t - g))" +
          " / 1800.0) * 1000000000.0) AS BIGINT)").as("w"))
      .groupBy(col("g"))
      .agg(sum(col("w").cast("decimal(38,0)") * col("y")).as("swy"),
        sum(col("w")).as("sw"))
      .select(col("g").as("grid_t"),
        expr("CAST(swy div sw AS BIGINT)").as("nw_dollars"),
        expr("CAST(sw div 1000000000 AS BIGINT)").as("eff_weight"))
      .orderBy(col("grid_t"))
  }

  /** Tukey 53H: running median-5, then median-3, then the Hanning
    * (¼,½,¼) head — kept ×4 to stay integer. Reports the 10 days the
    * smoother most disagrees with (the outlier screen), full windows
    * only. */
  def q737: Q = Q(
    "q737_tukey_53h",
    Some(s"""
      |WITH ${sqlO},
      |nn AS (SELECT max(t) AS n FROM o),
      |m5 AS (
      |  SELECT * FROM (
      |    SELECT t, day, y,
      |           CAST(median(y) OVER (ORDER BY t ROWS BETWEEN 2
      |             PRECEDING AND 2 FOLLOWING) AS BIGINT) AS m
      |    FROM o) z
      |  WHERE t BETWEEN 3 AND (SELECT n FROM nn) - 2),
      |m3 AS (
      |  SELECT * FROM (
      |    SELECT t, day, y,
      |           CAST(median(m) OVER (ORDER BY t ROWS BETWEEN 1
      |             PRECEDING AND 1 FOLLOWING) AS BIGINT) AS m2
      |    FROM m5) z
      |  WHERE t BETWEEN 4 AND (SELECT n FROM nn) - 3),
      |hh AS (
      |  SELECT t, day, y,
      |         lag(m2) OVER (ORDER BY t) + 2 * m2
      |           + lead(m2) OVER (ORDER BY t) AS h4
      |  FROM m3)
      |SELECT CAST(day AS BIGINT) AS day, y AS raw_dollars,
      |       CAST(h4 // 4 AS BIGINT) AS smooth_dollars,
      |       CAST(abs(4 * y - h4) AS BIGINT) AS gap4
      |FROM hh WHERE h4 IS NOT NULL
      |ORDER BY gap4 DESC, day LIMIT 10
      |""".stripMargin)) { (s, dir) =>
    val ob = o(s, dir)
      .withColumn("n", count(lit(1)).over(Window.partitionBy(lit(1))))
      .materialize()
    val w5 = Window.orderBy(col("t")).rowsBetween(-2, 2)
    val m5 = ob
      .withColumn("arr", sort_array(collect_list(col("y")).over(w5)))
      .where(col("t").between(lit(3), col("n") - 2))
      .select(col("t"), col("day"), col("y"), col("n"),
        col("arr").getItem(2).as("m"))
    val w3 = Window.orderBy(col("t")).rowsBetween(-1, 1)
    val m3 = m5
      .withColumn("arr", sort_array(collect_list(col("m")).over(w3)))
      .where(col("t").between(lit(4), col("n") - 3))
      .select(col("t"), col("day"), col("y"),
        col("arr").getItem(1).as("m2"))
    m3.withColumn("h4",
        lag(col("m2"), 1).over(Window.orderBy(col("t")))
          + lit(2) * col("m2")
          + lead(col("m2"), 1).over(Window.orderBy(col("t"))))
      .where(col("h4").isNotNull)
      .select(col("day").cast("long").as("day"),
        col("y").as("raw_dollars"),
        expr("CAST(h4 div 4 AS BIGINT)").as("smooth_dollars"),
        abs(lit(4) * col("y") - col("h4")).as("gap4"))
      .orderBy(col("gap4").desc, col("day"))
      .limit(10)
  }

  /** Hampel filter (window 21, k = 3): flag days where
    * |y − med₂₁| > 3·1.4826·MAD₂₁ — both medians are exact integers
    * from the odd-width sorted window; the 1.4826 factor enters as the
    * integer comparison 10000·|y−med| > 44478·mad. Reports flag count
    * and the 10 worst days. */
  def q738: Q = Q(
    "q738_hampel_filter",
    Some(s"""
      |WITH ${sqlO},
      |nn AS (SELECT max(t) AS n FROM o),
      |wl AS (
      |  SELECT t, day, y,
      |         list(y) OVER (ORDER BY t ROWS BETWEEN 10 PRECEDING
      |           AND 10 FOLLOWING) AS l
      |  FROM o),
      |md AS (
      |  SELECT t, day, y,
      |         CAST(list_aggregate(l, 'median') AS BIGINT) AS med,
      |         CAST(list_aggregate(list_transform(l, v -> abs(v -
      |           CAST(list_aggregate(l, 'median') AS BIGINT))),
      |           'median') AS BIGINT) AS mad
      |  FROM wl
      |  WHERE t BETWEEN 11 AND (SELECT n FROM nn) - 10),
      |fl AS (
      |  SELECT day, y, med, mad,
      |         CASE WHEN 10000 * abs(y - med) > 44478 * mad
      |              THEN 1 ELSE 0 END AS flagged
      |  FROM md)
      |SELECT CAST(day AS BIGINT) AS day, y AS raw_dollars,
      |       CAST(med AS BIGINT) AS window_median,
      |       CAST(mad AS BIGINT) AS window_mad,
      |       (SELECT CAST(sum(flagged) AS BIGINT) FROM fl) AS n_flagged
      |FROM fl WHERE flagged = 1
      |ORDER BY abs(y - med) DESC, day LIMIT 10
      |""".stripMargin)) { (s, dir) =>
    val ob = o(s, dir)
      .withColumn("n", count(lit(1)).over(Window.partitionBy(lit(1))))
    val w21 = Window.orderBy(col("t")).rowsBetween(-10, 10)
    val md = ob
      .withColumn("arr", sort_array(collect_list(col("y")).over(w21)))
      .where(col("t").between(lit(11), col("n") - 10))
      .select(col("day"), col("y"), col("arr").getItem(10).as("med"),
        col("arr"))
      .select(col("day"), col("y"), col("med"),
        sort_array(transform(col("arr"),
          v => abs(v - col("med")))).getItem(10).as("mad"))
      .materialize()
    val fl = md.select(col("day"), col("y"), col("med"), col("mad"),
      when(lit(10000) * abs(col("y") - col("med"))
        > lit(44478) * col("mad"), 1L).otherwise(0L).as("flagged"))
      .materialize()
    val tot = fl.agg(sum(col("flagged")).as("n_flagged"))
    fl.where(col("flagged") === 1)
      .crossJoin(broadcast(tot))
      .select(col("day").cast("long").as("day"),
        col("y").as("raw_dollars"), col("med").as("window_median"),
        col("mad").as("window_mad"), col("n_flagged"))
      .orderBy(abs(col("raw_dollars") - col("window_median")).desc,
        col("day"))
      .limit(10)
  }

  /** Henderson 13-term trend filter: the seasonal-adjustment
    * workhorse, with weights as EXACT integer numerators from the
    * closed form u_j = 315(49−j²)(64−j²)(81−j²)(176−11j²)/D — the
    * smoothed series is Σu·y // D, fully integer. Reports the 10
    * largest trend deviations. */
  def q739: Q = Q(
    "q739_henderson_13",
    Some(s"""
      |WITH ${sqlO},
      |nn AS (SELECT max(t) AS n FROM o),
      |wj AS (
      |  SELECT j, 315 * (49 - j*j) * (64 - j*j) * (81 - j*j)
      |           * (176 - 11*j*j) AS u
      |  FROM (SELECT unnest(range(-6, 7)) AS j)),
      |dn AS (SELECT sum(u) AS dd FROM wj),
      |sm AS (
      |  SELECT a.t, a.day, a.y,
      |         sum(CAST(wj.u AS HUGEINT) * b.y) AS su
      |  FROM o a JOIN wj ON TRUE
      |       JOIN o b ON b.t = a.t + wj.j
      |  WHERE a.t BETWEEN 7 AND (SELECT n FROM nn) - 6
      |  GROUP BY 1, 2, 3
      |  HAVING count(*) = 13)
      |SELECT CAST(day AS BIGINT) AS day, y AS raw_dollars,
      |       CAST(su // dd AS BIGINT) AS trend_dollars,
      |       CAST(abs(CAST(y AS HUGEINT) * dd - su) // dd AS BIGINT)
      |         AS gap_dollars
      |FROM sm CROSS JOIN dn
      |ORDER BY abs(CAST(y AS HUGEINT) * dd - su) DESC, day LIMIT 10
      |""".stripMargin)) { (s, dir) =>
    val ob = o(s, dir)
      .withColumn("n", count(lit(1)).over(Window.partitionBy(lit(1))))
      .materialize()
    val wj = ob.sparkSession.range(-6, 7).select(col("id").as("j"),
      expr("315 * (49 - id*id) * (64 - id*id) * (81 - id*id)" +
        " * (176 - 11*id*id)").as("u"))
    val dn = wj.agg(sum(col("u")).as("dd"))
    val b = ob.select(col("t").as("bt"), col("y").as("by"))
    ob.where(col("t").between(lit(7), col("n") - 6))
      .crossJoin(broadcast(wj))
      .join(b, col("bt") === col("t") + col("j"))
      .groupBy(col("t"), col("day"), col("y"))
      .agg(sum(col("u").cast("decimal(38,0)") * col("by")).as("su"),
        count(lit(1)).as("cnt"))
      .where(col("cnt") === 13)
      .crossJoin(broadcast(dn))
      .select(col("day").cast("long").as("day"),
        col("y").as("raw_dollars"),
        expr("CAST(su div dd AS BIGINT)").as("trend_dollars"),
        expr("CAST(abs(CAST(y AS DECIMAL(38,0)) * dd - su) div dd" +
          " AS BIGINT)").as("gap_dollars"),
        expr("abs(CAST(y AS DECIMAL(38,0)) * dd - su)").as("gapx"))
      .orderBy(col("gapx").desc, col("day"))
      .limit(10)
      .drop("gapx")
  }

  /** Savitzky–Golay quadratic 11-point: integer weights
    * u_j = 267 − 15j² (D = 1287) — the least-squares local parabola.
    * Reports per-quarter mean absolute deviation of raw vs smoothed
    * (the roughness profile), fully integer. */
  def q740: Q = Q(
    "q740_savitzky_golay",
    Some(s"""
      |WITH ${sqlO},
      |nn AS (SELECT max(t) AS n FROM o),
      |wj AS (
      |  SELECT j, 267 - 15*j*j AS u
      |  FROM (SELECT unnest(range(-5, 6)) AS j)),
      |sm AS (
      |  SELECT a.t, a.day, a.y,
      |         sum(CAST(wj.u AS HUGEINT) * b.y) AS su
      |  FROM o a JOIN wj ON TRUE
      |       JOIN o b ON b.t = a.t + wj.j
      |  WHERE a.t BETWEEN 6 AND (SELECT n FROM nn) - 5
      |  GROUP BY 1, 2, 3
      |  HAVING count(*) = 11),
      |qt AS (
      |  SELECT (day // 90) AS q90,
      |         abs(1287 * CAST(y AS HUGEINT) - su) AS gap
      |  FROM sm)
      |SELECT CAST(q90 AS BIGINT) AS quarter_bucket,
      |       CAST(count(*) AS BIGINT) AS n_days,
      |       CAST(sum(gap) // (1287 * count(*)) AS BIGINT)
      |         AS mad_dollars
      |FROM qt GROUP BY q90 ORDER BY quarter_bucket
      |""".stripMargin)) { (s, dir) =>
    val ob = o(s, dir)
      .withColumn("n", count(lit(1)).over(Window.partitionBy(lit(1))))
      .materialize()
    val wj = ob.sparkSession.range(-5, 6).select(col("id").as("j"),
      expr("267 - 15*id*id").as("u"))
    val b = ob.select(col("t").as("bt"), col("y").as("by"))
    ob.where(col("t").between(lit(6), col("n") - 5))
      .crossJoin(broadcast(wj))
      .join(b, col("bt") === col("t") + col("j"))
      .groupBy(col("t"), col("day"), col("y"))
      .agg(sum(col("u").cast("decimal(38,0)") * col("by")).as("su"),
        count(lit(1)).as("cnt"))
      .where(col("cnt") === 11)
      .select(expr("day div 90").as("q90"),
        expr("abs(1287 * CAST(y AS DECIMAL(38,0)) - su)").as("gap"))
      .groupBy(col("q90"))
      .agg(count(lit(1)).as("n_days"), sum(col("gap")).as("sg"))
      .select(col("q90").cast("long").as("quarter_bucket"),
        col("n_days"),
        expr("CAST(sg div (1287 * n_days) AS BIGINT)")
          .as("mad_dollars"))
      .orderBy(col("quarter_bucket"))
  }
}
