package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-11 circular-statistics wave on the ship-date day-of-year
  * phase: resultant vector + circular median, the Rayleigh uniformity
  * test, per-ship-mode concentration, circular–linear correlation
  * with quantity, and the von Mises concentration estimate.
  *
  * Exactness: the angle weights cos/sin(2π(d−1)/366) are computed
  * DRIVER-side once and injected into BOTH engines as the same
  * micro-quantized integer literals (the SystemsQueries periodogram
  * discipline — no engine-side trig, whose libm vs JVM results can
  * differ in the last ulp), so every moment is an EXACT integer sum;
  * sqrt (IEEE correctly-rounded, engine-identical) and ln/exp finish
  * in ONE shared-text double step. The circular median is pure
  * integer arithmetic on the 366-bin histogram. The circular–linear
  * correlations are correlations WITH THE QUANTIZED weights (stated:
  * both engines correlate against identical integer regressors).
  *
  * Scale: one lineitem pass collapses to the ≤366-row day-of-year
  * histogram (a SpineCache spine shared by the wave); every
  * statistic is bin-dim work. */
object CircularStatQueries {

  val all: Seq[Q] = Seq(q1056, q1057, q1058, q1059, q1060)

  /** Driver-side micro-quantized angle weights for day-of-year d. */
  private def wtab: Seq[(Int, Long, Long)] = (1 to 366).map { d =>
    val th = 2.0 * math.Pi * (d - 1) / 366
    (d, math.floor(math.cos(th) * 1000000).toLong,
      math.floor(math.sin(th) * 1000000).toLong)
  }

  private def sqlW: String =
    "w(d, wc, ws) AS (VALUES " +
      wtab.map { case (d, c, sn) => s"($d, $c, $sn)" }.mkString(", ") +
      ")"

  private def wdf(s: SparkSession): DataFrame = {
    import s.implicits._
    wtab.toDF("d", "wc", "ws")
  }

  /** Oracle day-of-year histogram CTE: h(d, nd, sq, sq2). */
  private def sqlH: String = """
    |h AS (SELECT dayofyear(CAST(l_shipdate AS DATE)) AS d,
    |             count(*) AS nd,
    |             sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS sq,
    |             sum(CAST(floor(l_quantity + 0.5) AS BIGINT)
    |                 * CAST(floor(l_quantity + 0.5) AS BIGINT)) AS sq2
    |      FROM lineitem GROUP BY 1)""".stripMargin

  /** Spark twin: the day-of-year histogram spine (d, nd, sq, sq2). */
  private def doyStats(s: SparkSession, dir: String): DataFrame =
    graft.sources.SpineCache.table(s, dir, "doy_stats",
      Seq("lineitem")) {
      Tables.lineitem(s, dir)
        .select(dayofyear(col("l_shipdate").cast("date")).as("d"),
          expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").as("qv"))
        .groupBy(col("d"))
        .agg(count(lit(1)).as("nd"), sum(col("qv")).as("sq"),
          sum(col("qv") * col("qv")).as("sq2"))
    }

  /** Exact integer resultant sums C = Σ nd·wc, S = Σ nd·ws (micro
    * scale) + n, as a 1-row frame both engines share. */
  private def sqlCs: String = s"""
    |${sqlH},
    |${sqlW},
    |cs AS (SELECT sum(CAST(nd AS HUGEINT) * wc) AS c,
    |              sum(CAST(nd AS HUGEINT) * ws) AS s2,
    |              sum(nd) AS n
    |       FROM h JOIN w ON w.d = h.d)""".stripMargin

  private def csFrame(s: SparkSession, dir: String): DataFrame =
    doyStats(s, dir).join(broadcast(wdf(s)), "d")
      .agg(sum(expr("CAST(nd AS DECIMAL(38,0)) * wc")).as("c"),
        sum(expr("CAST(nd AS DECIMAL(38,0)) * ws")).as("s2"),
        sum(col("nd")).as("n"))

  /** Resultant vector, mean resultant length, and the circular
    * median day (the doy minimizing total wrapped distance). */
  def q1056: Q = Q(
    "q1056_circular_resultant",
    Some(s"""
      |WITH ${sqlCs},
      |md AS (
      |  SELECT a.d AS cand,
      |         sum(b.nd * least(abs(a.d - b.d), 366 - abs(a.d - b.d)))
      |           AS td
      |  FROM h a CROSS JOIN h b GROUP BY 1),
      |cm AS (SELECT min_by(cand, td * 1000 + cand) AS med FROM md)
      |SELECT CAST(cs.n AS BIGINT) AS n_items,
      |       CAST(cs.c AS BIGINT) AS c_sum_micro,
      |       CAST(cs.s2 AS BIGINT) AS s_sum_micro,
      |       CAST(floor(sqrt(CAST(cs.c AS DOUBLE) * CAST(cs.c AS DOUBLE)
      |            + CAST(cs.s2 AS DOUBLE) * CAST(cs.s2 AS DOUBLE))
      |            / cs.n) AS BIGINT) AS resultant_ppm,
      |       CAST(cm.med AS BIGINT) AS circular_median_day
      |FROM cs CROSS JOIN cm
      |""".stripMargin)) { (s, dir) =>
    val h = doyStats(s, dir)
    val md = h.select(col("d").as("cand"))
      .crossJoin(h.select(col("d").as("bd"), col("nd")))
      .groupBy(col("cand"))
      .agg(sum(col("nd") * least(abs(col("cand") - col("bd")),
        lit(366) - abs(col("cand") - col("bd")))).as("td"))
    val cm = md.agg(min_by(col("cand"),
      col("td") * 1000L + col("cand")).as("med"))
    csFrame(s, dir).crossJoin(broadcast(cm))
      .select(col("n").cast("long").as("n_items"),
        col("c").cast("long").as("c_sum_micro"),
        col("s2").cast("long").as("s_sum_micro"),
        expr("CAST(floor(sqrt(CAST(c AS DOUBLE) * CAST(c AS DOUBLE)" +
          " + CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)) / n) AS BIGINT)")
          .as("resultant_ppm"),
        col("med").cast("long").as("circular_median_day"))
  }

  /** Rayleigh uniformity test: z = n·R̄², p ≈ exp(−z). */
  def q1057: Q = Q(
    "q1057_rayleigh_test",
    Some(s"""
      |WITH ${sqlCs}
      |SELECT CAST(n AS BIGINT) AS n_items,
      |       CAST(floor(1000.0 * (CAST(c AS DOUBLE) * CAST(c AS DOUBLE)
      |            + CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))
      |            / (CAST(n AS DOUBLE) * 1e12)) AS BIGINT) AS z_milli,
      |       CAST(floor(1000000.0 * exp(-((CAST(c AS DOUBLE)
      |            * CAST(c AS DOUBLE) + CAST(s2 AS DOUBLE)
      |            * CAST(s2 AS DOUBLE))
      |            / (CAST(n AS DOUBLE) * 1e12)))) AS BIGINT) AS p_micro
      |FROM cs
      |""".stripMargin)) { (s, dir) =>
    csFrame(s, dir)
      .select(col("n").cast("long").as("n_items"),
        expr("CAST(floor(1000.0 * (CAST(c AS DOUBLE) * CAST(c AS DOUBLE)" +
          " + CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))" +
          " / (CAST(n AS DOUBLE) * 1e12)) AS BIGINT)").as("z_milli"),
        expr("CAST(floor(1000000.0 * exp(-((CAST(c AS DOUBLE)" +
          " * CAST(c AS DOUBLE) + CAST(s2 AS DOUBLE)" +
          " * CAST(s2 AS DOUBLE))" +
          " / (CAST(n AS DOUBLE) * 1e12)))) AS BIGINT)").as("p_micro"))
  }

  /** Per-return-flag seasonal concentration: resultant length and
    * circular dispersion by flag. */
  def q1058: Q = Q(
    "q1058_flag_concentration",
    Some(s"""
      |WITH hm AS (SELECT l_returnflag AS smode,
      |                   dayofyear(CAST(l_shipdate AS DATE)) AS d,
      |                   count(*) AS nd
      |            FROM lineitem GROUP BY 1, 2),
      |${sqlW},
      |cs AS (SELECT smode,
      |              sum(CAST(nd AS HUGEINT) * wc) AS c,
      |              sum(CAST(nd AS HUGEINT) * ws) AS s2,
      |              sum(nd) AS n
      |       FROM hm JOIN w ON w.d = hm.d GROUP BY 1),
      |rr AS (SELECT smode, n,
      |              sqrt(CAST(c AS DOUBLE) * CAST(c AS DOUBLE)
      |                 + CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))
      |                / (CAST(n AS DOUBLE) * 1e6) AS rbar
      |       FROM cs)
      |SELECT smode AS return_flag, CAST(n AS BIGINT) AS n_items,
      |       CAST(floor(1000000.0 * rbar) AS BIGINT) AS resultant_ppm,
      |       CAST(floor(1000.0 * sqrt(-2 * ln(rbar))) AS BIGINT)
      |         AS circ_std_milli
      |FROM rr ORDER BY return_flag
      |""".stripMargin)) { (s, dir) =>
    val hm = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag").as("return_flag"),
        dayofyear(col("l_shipdate").cast("date")).as("d"))
      .agg(count(lit(1)).as("nd"))
    hm.join(broadcast(wdf(s)), "d")
      .groupBy(col("return_flag"))
      .agg(sum(expr("CAST(nd AS DECIMAL(38,0)) * wc")).as("c"),
        sum(expr("CAST(nd AS DECIMAL(38,0)) * ws")).as("s2"),
        sum(col("nd")).as("n"))
      .select(col("return_flag"), col("n"), col("c"), col("s2"),
        expr("sqrt(CAST(c AS DOUBLE) * CAST(c AS DOUBLE)" +
          " + CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))" +
          " / (CAST(n AS DOUBLE) * 1e6)").as("rbar"))
      .select(col("return_flag"), col("n").cast("long").as("n_items"),
        expr("CAST(floor(1000000.0 * rbar) AS BIGINT)")
          .as("resultant_ppm"),
        expr("CAST(floor(1000.0 * sqrt(-2 * ln(rbar))) AS BIGINT)")
          .as("circ_std_milli"))
      .orderBy(col("return_flag"))
  }

  /** Circular–linear correlation between the day-of-year phase and
    * quantity: r(q, wc), r(q, ws), r(wc, ws), and the combined R². */
  def q1059: Q = Q(
    "q1059_circular_linear_corr",
    Some(s"""
      |WITH ${sqlH},
      |${sqlW},
      |mo AS (
      |  SELECT sum(nd) AS n, sum(sq) AS tq, sum(sq2) AS tq2,
      |         sum(CAST(nd AS HUGEINT) * wc) AS swc,
      |         sum(CAST(nd AS HUGEINT) * ws) AS sws,
      |         sum(CAST(nd AS HUGEINT) * wc * wc) AS swc2,
      |         sum(CAST(nd AS HUGEINT) * ws * ws) AS sws2,
      |         sum(CAST(nd AS HUGEINT) * wc * ws) AS swcs,
      |         sum(CAST(sq AS HUGEINT) * wc) AS sqwc,
      |         sum(CAST(sq AS HUGEINT) * ws) AS sqws
      |  FROM h JOIN w ON w.d = h.d),
      |dm AS (SELECT CAST(n AS DOUBLE) AS n, CAST(tq AS DOUBLE) AS tq,
      |              CAST(tq2 AS DOUBLE) AS tq2,
      |              CAST(swc AS DOUBLE) AS swc,
      |              CAST(sws AS DOUBLE) AS sws,
      |              CAST(swc2 AS DOUBLE) AS swc2,
      |              CAST(sws2 AS DOUBLE) AS sws2,
      |              CAST(swcs AS DOUBLE) AS swcs,
      |              CAST(sqwc AS DOUBLE) AS sqwc,
      |              CAST(sqws AS DOUBLE) AS sqws
      |       FROM mo),
      |rs AS (SELECT n,
      |  (n * sqwc - tq * swc) / sqrt((n * tq2 - tq * tq)
      |    * (n * swc2 - swc * swc)) AS rxc,
      |  (n * sqws - tq * sws) / sqrt((n * tq2 - tq * tq)
      |    * (n * sws2 - sws * sws)) AS rxs,
      |  (n * swcs - swc * sws) / sqrt((n * swc2 - swc * swc)
      |    * (n * sws2 - sws * sws)) AS rcs
      |  FROM dm)
      |SELECT CAST(n AS BIGINT) AS n_items,
      |       CAST(floor(1000000.0 * rxc) AS BIGINT) AS r_qc_micro,
      |       CAST(floor(1000000.0 * rxs) AS BIGINT) AS r_qs_micro,
      |       CAST(floor(1000000.0 * rcs) AS BIGINT) AS r_cs_micro,
      |       CAST(floor(1000000.0 * ((rxc * rxc + rxs * rxs
      |            - 2 * rxc * rxs * rcs) / (1 - rcs * rcs)))
      |            AS BIGINT) AS r2_micro
      |FROM rs
      |""".stripMargin)) { (s, dir) =>
    val mo = doyStats(s, dir).join(broadcast(wdf(s)), "d")
      .agg(sum(col("nd")).as("n"), sum(col("sq")).as("tq"),
        sum(col("sq2")).as("tq2"),
        sum(expr("CAST(nd AS DECIMAL(38,0)) * wc")).as("swc"),
        sum(expr("CAST(nd AS DECIMAL(38,0)) * ws")).as("sws"),
        sum(expr("CAST(nd AS DECIMAL(38,0)) * wc * wc")).as("swc2"),
        sum(expr("CAST(nd AS DECIMAL(38,0)) * ws * ws")).as("sws2"),
        sum(expr("CAST(nd AS DECIMAL(38,0)) * wc * ws")).as("swcs"),
        sum(expr("CAST(sq AS DECIMAL(38,0)) * wc")).as("sqwc"),
        sum(expr("CAST(sq AS DECIMAL(38,0)) * ws")).as("sqws"))
    val dm = mo.select(
      col("n").cast("double").as("n"), col("tq").cast("double").as("tq"),
      col("tq2").cast("double").as("tq2"),
      col("swc").cast("double").as("swc"),
      col("sws").cast("double").as("sws"),
      col("swc2").cast("double").as("swc2"),
      col("sws2").cast("double").as("sws2"),
      col("swcs").cast("double").as("swcs"),
      col("sqwc").cast("double").as("sqwc"),
      col("sqws").cast("double").as("sqws"))
    val rs = dm.select(col("n"),
      expr("(n * sqwc - tq * swc) / sqrt((n * tq2 - tq * tq)" +
        " * (n * swc2 - swc * swc))").as("rxc"),
      expr("(n * sqws - tq * sws) / sqrt((n * tq2 - tq * tq)" +
        " * (n * sws2 - sws * sws))").as("rxs"),
      expr("(n * swcs - swc * sws) / sqrt((n * swc2 - swc * swc)" +
        " * (n * sws2 - sws * sws))").as("rcs"))
    rs.select(col("n").cast("long").as("n_items"),
      expr("CAST(floor(1000000.0 * rxc) AS BIGINT)").as("r_qc_micro"),
      expr("CAST(floor(1000000.0 * rxs) AS BIGINT)").as("r_qs_micro"),
      expr("CAST(floor(1000000.0 * rcs) AS BIGINT)").as("r_cs_micro"),
      expr("CAST(floor(1000000.0 * ((rxc * rxc + rxs * rxs" +
        " - 2 * rxc * rxs * rcs) / (1 - rcs * rcs))) AS BIGINT)")
        .as("r2_micro"))
  }

  /** Von Mises concentration estimate (Fisher's piecewise κ̂) plus
    * circular variance and standard deviation. */
  def q1060: Q = Q(
    "q1060_von_mises_kappa",
    Some(s"""
      |WITH ${sqlCs},
      |rr AS (SELECT n,
      |              sqrt(CAST(c AS DOUBLE) * CAST(c AS DOUBLE)
      |                 + CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))
      |                / (CAST(n AS DOUBLE) * 1e6) AS rbar
      |       FROM cs)
      |SELECT CAST(n AS BIGINT) AS n_items,
      |       CAST(floor(1000000.0 * rbar) AS BIGINT) AS resultant_ppm,
      |       CAST(floor(1000000.0 * (1 - rbar)) AS BIGINT)
      |         AS circ_var_ppm,
      |       CAST(floor(1000.0 * sqrt(-2 * ln(rbar))) AS BIGINT)
      |         AS circ_std_milli,
      |       CAST(floor(1000.0 * (CASE
      |            WHEN rbar < 0.53 THEN 2 * rbar + rbar * rbar * rbar
      |                 + 5 * rbar * rbar * rbar * rbar * rbar / 6
      |            WHEN rbar < 0.85 THEN -0.4 + 1.39 * rbar
      |                 + 0.43 / (1 - rbar)
      |            ELSE 1 / (rbar * rbar * rbar - 4 * rbar * rbar
      |                 + 3 * rbar) END)) AS BIGINT) AS kappa_milli
      |FROM rr
      |""".stripMargin)) { (s, dir) =>
    csFrame(s, dir)
      .select(col("n"),
        expr("sqrt(CAST(c AS DOUBLE) * CAST(c AS DOUBLE)" +
          " + CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))" +
          " / (CAST(n AS DOUBLE) * 1e6)").as("rbar"))
      .select(col("n").cast("long").as("n_items"),
        expr("CAST(floor(1000000.0 * rbar) AS BIGINT)")
          .as("resultant_ppm"),
        expr("CAST(floor(1000000.0 * (1 - rbar)) AS BIGINT)")
          .as("circ_var_ppm"),
        expr("CAST(floor(1000.0 * sqrt(-2 * ln(rbar))) AS BIGINT)")
          .as("circ_std_milli"),
        expr("CAST(floor(1000.0 * (CASE" +
          " WHEN rbar < 0.53 THEN 2 * rbar + rbar * rbar * rbar" +
          " + 5 * rbar * rbar * rbar * rbar * rbar / 6" +
          " WHEN rbar < 0.85 THEN -0.4 + 1.39 * rbar" +
          " + 0.43 / (1 - rbar)" +
          " ELSE 1 / (rbar * rbar * rbar - 4 * rbar * rbar" +
          " + 3 * rbar) END)) AS BIGINT)").as("kappa_milli"))
  }
}
