package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-11 distribution-drift monitoring wave (the PSI/CSI panel a
  * production scoring pipeline runs between a reference and a current
  * window): population stability index of the order-value
  * distribution, its per-bin contribution table, characteristic
  * stability of lineitem features, the year-over-year drift curve,
  * and the exact distance panel (total variation / Hellinger /
  * Bhattacharyya).
  *
  * Exactness: bins are VALUE-based integer buckets (never sample
  * quantiles, so bin edges are scale-free constants); counts are
  * exact; PSI/CSI terms use add-one smoothing stated identically in
  * both engines and each (p−q)·ln(p/q) term is quantized to
  * DECIMAL(28,9) before the order-free exact sum (the house PSI
  * discipline — here applied to the actual PSI). Total variation is
  * a PURE integer rational: Σ|c·m − d·n| // (2·n·m).
  *
  * Scale: one orders (or lineitem) scan collapses to a ≤11-bin
  * histogram per window; everything downstream is bin-dim. */
object DriftMonitorQueries {

  val all: Seq[Q] = Seq(q1051, q1052, q1053, q1054, q1055)

  /** Order-value bin: 50k-dollar buckets capped at bin 9 (stated in
    * cents: 5,000,000). */
  private def sqlBins: String = """
    |ob AS (SELECT least(CAST(o_totalprice * 100 AS BIGINT) // 5000000,
    |                    9) AS bin,
    |              year(o_orderdate) AS yr
    |       FROM orders),
    |bins AS (SELECT unnest(range(0, 10)) AS bin)""".stripMargin

  /** Spark twin of `ob`: (bin, yr) per order. */
  private def orderBins(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(least(expr(
        "CAST(o_totalprice * 100 AS DECIMAL(38,0)) div 5000000"),
        lit(9L)).as("bin"),
        year(col("o_orderdate")).as("yr"))

  /** All 10 bins with reference (earliest order-year) and current
    * (latest order-year) counts — the windows are DATA-adaptive order
    * statistics, never constants (the testdata calendar moves with
    * regeneration). */
  private def sqlRefCur: String = s"""
    |${sqlBins},
    |yrs AS (SELECT min(yr) AS ry, max(yr) AS cy FROM ob),
    |cnt AS (SELECT bin,
    |               sum(CASE WHEN yr = yrs.ry THEN 1 ELSE 0 END) AS c,
    |               sum(CASE WHEN yr = yrs.cy THEN 1 ELSE 0 END) AS d
    |        FROM ob CROSS JOIN yrs GROUP BY 1),
    |rc AS (SELECT bins.bin, coalesce(cnt.c, 0) AS c,
    |              coalesce(cnt.d, 0) AS d
    |       FROM bins LEFT JOIN cnt ON cnt.bin = bins.bin),
    |tot AS (SELECT sum(c) AS n, sum(d) AS m FROM rc)""".stripMargin

  /** Spark twin of `rc` + 1-row `tot`: (frame(bin, c, d), totals). */
  private def refCur(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val ob = orderBins(s, dir)
    val yrs = ob.agg(min(col("yr")).as("ry"), max(col("yr")).as("cy"))
    val cnt = ob.crossJoin(broadcast(yrs))
      .groupBy(col("bin"))
      .agg(sum(when(col("yr") === col("ry"), 1L).otherwise(0L)).as("c"),
        sum(when(col("yr") === col("cy"), 1L).otherwise(0L)).as("d"))
    val bins = s.range(0, 10).select(col("id").as("bin"))
    val rc = bins.join(cnt, Seq("bin"), "left_outer")
      .select(col("bin"), coalesce(col("c"), lit(0L)).as("c"),
        coalesce(col("d"), lit(0L)).as("d"))
    val tot = rc.agg(sum(col("c")).as("n"), sum(col("d")).as("m"))
    (rc, tot)
  }

  /** Shared PSI term text over integer columns c, d, n, m (add-one
    * smoothed, one double expression, quantized by the caller). */
  private def psiTerm: String =
    "(CAST(c + 1 AS DOUBLE) / (n + 10) - CAST(d + 1 AS DOUBLE) / (m + 10))" +
      " * ln((CAST(c + 1 AS DOUBLE) / (n + 10))" +
      " / (CAST(d + 1 AS DOUBLE) / (m + 10)))"

  /** PSI of the order-value distribution, latest vs earliest year. */
  def q1051: Q = Q(
    "q1051_psi_order_value",
    Some(s"""
      |WITH ${sqlRefCur},
      |tm AS (SELECT rc.bin,
      |              CAST($psiTerm AS DECIMAL(28,9)) AS term
      |       FROM rc CROSS JOIN tot)
      |SELECT CAST(tot.n AS BIGINT) AS n_ref,
      |       CAST(tot.m AS BIGINT) AS n_cur,
      |       CAST(floor(1000000.0 * CAST(ag.s AS DOUBLE)) AS BIGINT)
      |         AS psi_micro,
      |       CAST(ag.top_bin AS BIGINT) AS top_bin
      |FROM (SELECT sum(term) AS s,
      |             min_by(bin, bin - 100 * CAST(floor(1000000000.0
      |               * CAST(term AS DOUBLE)) AS BIGINT)) AS top_bin
      |      FROM tm) ag CROSS JOIN tot
      |""".stripMargin)) { (s, dir) =>
    val (rc, tot) = refCur(s, dir)
    val tm = rc.crossJoin(broadcast(tot))
      .select(col("bin"),
        expr(s"CAST($psiTerm AS DECIMAL(28,9))").as("term"))
    tm.agg(sum(col("term")).as("s"),
        min_by(col("bin"), col("bin") - lit(100L) *
          expr("CAST(floor(1000000000.0 * CAST(term AS DOUBLE)) AS BIGINT)"))
          .as("top_bin"))
      .crossJoin(broadcast(tot))
      .select(col("n").cast("long").as("n_ref"),
        col("m").cast("long").as("n_cur"),
        expr("CAST(floor(1000000.0 * CAST(s AS DOUBLE)) AS BIGINT)")
          .as("psi_micro"),
        col("top_bin").cast("long").as("top_bin"))
  }

  /** The per-bin PSI contribution table. */
  def q1052: Q = Q(
    "q1052_psi_contributions",
    Some(s"""
      |WITH ${sqlRefCur}
      |SELECT CAST(rc.bin AS BIGINT) AS bin,
      |       CAST(rc.c AS BIGINT) AS ref_count,
      |       CAST(rc.d AS BIGINT) AS cur_count,
      |       CAST((1000000 * rc.c) // tot.n AS BIGINT) AS ref_ppm,
      |       CAST((1000000 * rc.d) // tot.m AS BIGINT) AS cur_ppm,
      |       CAST(floor(1000000000.0 * ($psiTerm)) AS BIGINT)
      |         AS contribution_nano
      |FROM rc CROSS JOIN tot ORDER BY bin
      |""".stripMargin)) { (s, dir) =>
    val (rc, tot) = refCur(s, dir)
    rc.crossJoin(broadcast(tot))
      .select(col("bin").cast("long").as("bin"),
        col("c").as("ref_count"), col("d").as("cur_count"),
        expr("CAST((1000000 * c) div n AS BIGINT)").as("ref_ppm"),
        expr("CAST((1000000 * d) div m AS BIGINT)").as("cur_ppm"),
        expr(s"CAST(floor(1000000000.0 * ($psiTerm)) AS BIGINT)")
          .as("contribution_nano"))
      .orderBy(col("bin"))
  }

  /** Characteristic stability of lineitem features (quantity in
    * 5-unit bins, discount in percent bins), latest vs earliest
    * ship-year. */
  def q1053: Q = Q(
    "q1053_csi_features",
    Some(s"""
      |WITH li AS (SELECT year(CAST(l_shipdate AS DATE)) AS yr,
      |                   CAST(floor(l_quantity + 0.5) AS BIGINT) AS qv,
      |                   CAST(round(l_discount * 100, 0) AS BIGINT) AS dv
      |            FROM lineitem),
      |yrs AS (SELECT min(yr) AS ry, max(yr) AS cy FROM li),
      |fb AS (
      |  SELECT 'quantity' AS feature, (qv - 1) // 5 AS bin, yr FROM li
      |  UNION ALL
      |  SELECT 'discount', dv, yr FROM li),
      |cnt AS (SELECT feature, bin,
      |               sum(CASE WHEN yr = yrs.ry THEN 1 ELSE 0 END) AS c,
      |               sum(CASE WHEN yr = yrs.cy THEN 1 ELSE 0 END) AS d
      |        FROM fb CROSS JOIN yrs GROUP BY 1, 2),
      |tot AS (SELECT feature, sum(c) AS n, sum(d) AS m,
      |               count(*) AS nb
      |        FROM cnt GROUP BY 1),
      |tm AS (SELECT cnt.feature, tot.n, tot.m,
      |              CAST((CAST(c + 1 AS DOUBLE) / (n + nb)
      |                    - CAST(d + 1 AS DOUBLE) / (m + nb))
      |                * ln((CAST(c + 1 AS DOUBLE) / (n + nb))
      |                   / (CAST(d + 1 AS DOUBLE) / (m + nb)))
      |                AS DECIMAL(28,9)) AS term
      |       FROM cnt JOIN tot ON tot.feature = cnt.feature)
      |SELECT feature,
      |       CAST(any_value(n) AS BIGINT) AS n_ref,
      |       CAST(any_value(m) AS BIGINT) AS n_cur,
      |       CAST(floor(1000000.0 * CAST(sum(term) AS DOUBLE))
      |            AS BIGINT) AS csi_micro
      |FROM tm GROUP BY 1 ORDER BY feature
      |""".stripMargin)) { (s, dir) =>
    val li = Tables.lineitem(s, dir)
      .select(year(col("l_shipdate").cast("date")).as("yr"),
        expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").as("qv"),
        expr("CAST(round(l_discount * 100, 0) AS BIGINT)").as("dv"))
    val yrs = li.agg(min(col("yr")).as("ry"), max(col("yr")).as("cy"))
    val fb = li.select(lit("quantity").as("feature"),
        expr("(qv - 1) div 5").as("bin"), col("yr"))
      .unionAll(li.select(lit("discount").as("feature"),
        col("dv").as("bin"), col("yr")))
    val cnt = fb.crossJoin(broadcast(yrs))
      .groupBy(col("feature"), col("bin"))
      .agg(sum(when(col("yr") === col("ry"), 1L).otherwise(0L)).as("c"),
        sum(when(col("yr") === col("cy"), 1L).otherwise(0L)).as("d"))
    val tot = cnt.groupBy(col("feature"))
      .agg(sum(col("c")).as("n"), sum(col("d")).as("m"),
        count(lit(1)).as("nb"))
    cnt.join(broadcast(tot), "feature")
      .select(col("feature"),
        expr("""CAST((CAST(c + 1 AS DOUBLE) / (n + nb)
          |      - CAST(d + 1 AS DOUBLE) / (m + nb))
          |  * ln((CAST(c + 1 AS DOUBLE) / (n + nb))
          |     / (CAST(d + 1 AS DOUBLE) / (m + nb)))
          |  AS DECIMAL(28,9))""".stripMargin).as("term"),
        col("n"), col("m"))
      .groupBy(col("feature"))
      .agg(first(col("n")).cast("long").as("n_ref"),
        first(col("m")).cast("long").as("n_cur"),
        expr("CAST(floor(1000000.0 * CAST(sum(term) AS DOUBLE))" +
          " AS BIGINT)").as("csi_micro"))
      .orderBy(col("feature"))
  }

  /** The drift curve: PSI of every order-year against the earliest. */
  def q1054: Q = Q(
    "q1054_psi_drift_curve",
    Some(s"""
      |WITH ${sqlBins},
      |yb AS (SELECT yr, bins.bin,
      |              coalesce(c, 0) AS d
      |       FROM (SELECT DISTINCT yr FROM ob) y CROSS JOIN bins
      |       LEFT JOIN (SELECT yr AS cy, bin AS cb, count(*) AS c
      |                  FROM ob GROUP BY 1, 2) cc
      |         ON cc.cy = y.yr AND cc.cb = bins.bin),
      |ry AS (SELECT min(yr) AS ry FROM ob),
      |rf AS (SELECT bin, d AS c FROM yb CROSS JOIN ry WHERE yr = ry.ry),
      |tn AS (SELECT sum(c) AS n FROM rf),
      |tm AS (SELECT yb.yr, sum(d) OVER (PARTITION BY yb.yr) AS m,
      |              rf.c, yb.d, tn.n, yb.bin
      |       FROM yb JOIN rf ON rf.bin = yb.bin CROSS JOIN tn),
      |terms AS (SELECT yr, m,
      |                 CAST($psiTerm AS DECIMAL(28,9)) AS term
      |          FROM tm)
      |SELECT CAST(yr AS BIGINT) AS order_year,
      |       CAST(any_value(m) AS BIGINT) AS n_orders,
      |       CAST(floor(1000000.0 * CAST(sum(term) AS DOUBLE))
      |            AS BIGINT) AS psi_micro
      |FROM terms GROUP BY 1 ORDER BY order_year
      |""".stripMargin)) { (s, dir) =>
    val ob = orderBins(s, dir)
    val cc = ob.groupBy(col("yr"), col("bin")).agg(count(lit(1)).as("c"))
    val years = ob.select(col("yr")).distinct()
    val bins = s.range(0, 10).select(col("id").as("bin"))
    val yb = years.crossJoin(bins)
      .join(cc, Seq("yr", "bin"), "left_outer")
      .select(col("yr"), col("bin"), coalesce(col("c"), lit(0L)).as("d"))
    val ry = yb.agg(min(col("yr")).as("ry"))
    val rf = yb.crossJoin(broadcast(ry))
      .where(col("yr") === col("ry"))
      .select(col("bin"), col("d").as("c"))
    val tn = rf.agg(sum(col("c")).as("n"))
    val m = yb.groupBy(col("yr")).agg(sum(col("d")).as("m"))
    yb.join(broadcast(rf), "bin").join(broadcast(m), "yr")
      .crossJoin(broadcast(tn))
      .select(col("yr"), col("m"),
        expr(s"CAST($psiTerm AS DECIMAL(28,9))").as("term"))
      .groupBy(col("yr").cast("long").as("order_year"))
      .agg(first(col("m")).cast("long").as("n_orders"),
        expr("CAST(floor(1000000.0 * CAST(sum(term) AS DOUBLE))" +
          " AS BIGINT)").as("psi_micro"))
      .orderBy(col("order_year"))
  }

  /** Exact distance panel between the earliest and latest order-year
    * value distributions: total variation (pure integer rational),
    * Hellinger and Bhattacharyya (quantized sqrt terms). */
  def q1055: Q = Q(
    "q1055_distribution_distances",
    Some(s"""
      |WITH ${sqlRefCur},
      |tm AS (SELECT rc.bin,
      |              abs(CAST(rc.c AS HUGEINT) * tot.m
      |                  - CAST(rc.d AS HUGEINT) * tot.n) AS num,
      |              CAST(sqrt((CAST(rc.c AS DOUBLE) / tot.n)
      |                      * (CAST(rc.d AS DOUBLE) / tot.m))
      |                   AS DECIMAL(28,9)) AS bc
      |       FROM rc CROSS JOIN tot)
      |SELECT CAST((1000000 * sum(num))
      |            // (2 * CAST(tot.n AS HUGEINT) * tot.m) AS BIGINT)
      |         AS tv_micro,
      |       CAST(floor(1000000.0
      |            * sqrt(1 - least(CAST(sum(bc) AS DOUBLE), 1)))
      |            AS BIGINT) AS hellinger_micro,
      |       CAST(floor(1000000.0 * (-ln(CAST(sum(bc) AS DOUBLE))))
      |            AS BIGINT) AS bhattacharyya_micro
      |FROM tm CROSS JOIN tot GROUP BY tot.n, tot.m
      |""".stripMargin)) { (s, dir) =>
    val (rc, tot) = refCur(s, dir)
    rc.crossJoin(broadcast(tot))
      .select(
        expr("abs(CAST(c AS DECIMAL(38,0)) * m" +
          " - CAST(d AS DECIMAL(38,0)) * n)").as("num"),
        expr("CAST(sqrt((CAST(c AS DOUBLE) / n)" +
          " * (CAST(d AS DOUBLE) / m)) AS DECIMAL(28,9))").as("bc"),
        col("n"), col("m"))
      .groupBy(col("n"), col("m"))
      .agg(sum(col("num")).as("snum"), sum(col("bc")).as("sbc"))
      .select(
        expr("CAST((1000000 * snum)" +
          " div (2 * CAST(n AS DECIMAL(38,0)) * m) AS BIGINT)")
          .as("tv_micro"),
        expr("CAST(floor(1000000.0" +
          " * sqrt(1 - least(CAST(sbc AS DOUBLE), 1))) AS BIGINT)")
          .as("hellinger_micro"),
        expr("CAST(floor(1000000.0 * (-ln(CAST(sbc AS DOUBLE))))" +
          " AS BIGINT)").as("bhattacharyya_micro"))
  }
}
