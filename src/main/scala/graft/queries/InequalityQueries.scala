package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables

/** Round-9 inequality/concentration wave over customer revenue:
  * Atkinson index, Theil-T decomposition by region, Palma and
  * quintile-share ratios, the concentration index of returns against
  * revenue rank, and a year-over-year quintile mobility matrix. Cents
  * ride the exact decimal idiom; every ln/exp term is quantized per
  * row/group BEFORE summation (the shared-text discipline); all
  * fact-scaled ranks ride the bucket-parallel `globalRankCum`, never a
  * single-partition window over the customer dim (it scales with the
  * data). */
object InequalityQueries {

  val all: Seq[Q] = Seq(q666, q667, q668, q669, q670)

  /** Oracle CTE: per-customer revenue cents (customers with orders —
    * the positive-support domain the log-based indices need). */
  private def sqlRev: String =
    """rev AS (
      |  SELECT o_custkey AS ck,
      |         sum(CAST(o_totalprice * 100 AS HUGEINT)) AS cents
      |  FROM orders GROUP BY 1)""".stripMargin

  /** Spark twin: (ck, cents DECIMAL(38,0)). */
  private def rev(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_custkey").as("ck"))
      .agg(sum(expr("CAST(o_totalprice * 100 AS DECIMAL(38,0))"))
        .as("cents"))

  /** Atkinson inequality index at ε = 1: A = 1 − geomean/mean over
    * per-customer revenue. The geometric mean rides per-customer
    * micro-quantized ln terms (exact integer sum), the arithmetic mean
    * exact cents; one pinned exp/ln expression at the end, shared
    * text. The welfare-weighted counterpart of the Gini the repo
    * already ships (q153). */
  def q666: Q = {
    val atk = "CAST(floor((1.0 - exp(" +
      "CAST(sl AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0" +
      " - ln(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))) * 1000.0)" +
      " AS BIGINT)"
    Q("q666_atkinson_index",
      Some(s"""
        |WITH ${sqlRev},
        |lt AS (
        |  SELECT cents,
        |         CAST(floor(CAST(ln(CAST(cents AS DOUBLE))
        |           AS DECIMAL(28,9)) * 1000000) AS BIGINT) AS lnq
        |  FROM rev),
        |mo AS (SELECT count(*) AS n, sum(cents) AS sx, sum(lnq) AS sl
        |       FROM lt)
        |SELECT CAST(n AS BIGINT) AS n_customers,
        |       CAST(sx AS BIGINT) AS total_cents,
        |       CAST(sl // n AS BIGINT) AS mean_log_micro,
        |       $atk AS atkinson_milli
        |FROM mo
        |""".stripMargin)) { (s, dir) =>
      rev(s, dir)
        .select(col("cents"),
          expr("CAST(floor(CAST(ln(CAST(cents AS DOUBLE))" +
            " AS DECIMAL(28,9)) * 1000000) AS BIGINT)").as("lnq"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sx"),
          sum(col("lnq")).as("sl"))
        .select(col("n").as("n_customers"),
          col("sx").cast("long").as("total_cents"),
          expr("sl div n").as("mean_log_micro"),
          expr(atk).as("atkinson_milli"))
    }
  }

  /** Theil-T inequality decomposition by customer region: the total
    * index T = (1/n)Σ(x/μ)ln(x/μ), each region's internal T_r, and
    * the between-region term (s_r)·ln(μ_r/μ) — the "how much
    * inequality is geography" split. Every term micro-quantized per
    * customer (or per region) before its exact integer sum; the
    * decomposition identity holds up to stated quantization (each
    * piece independently exact). */
  def q667: Q = {
    def lnq(x: String) =
      s"CAST(floor(CAST($x AS DECIMAL(28,9)) * 1000000) AS BIGINT)"
    // per-customer global-Theil term: (x/mu)·ln(x/mu), mu = sx/n
    val tGlob = lnq("CAST(cents AS DOUBLE) * CAST(n AS DOUBLE)" +
      " / CAST(sx AS DOUBLE) * ln(CAST(cents AS DOUBLE)" +
      " * CAST(n AS DOUBLE) / CAST(sx AS DOUBLE))")
    // per-customer within-region term against the REGION mean
    val tReg = lnq("CAST(cents AS DOUBLE) * CAST(nr AS DOUBLE)" +
      " / CAST(sxr AS DOUBLE) * ln(CAST(cents AS DOUBLE)" +
      " * CAST(nr AS DOUBLE) / CAST(sxr AS DOUBLE))")
    // per-region between term: (sxr/sx)·ln(mu_r/mu)
    val tBet = lnq("CAST(sxr AS DOUBLE) / CAST(sx AS DOUBLE)" +
      " * ln(CAST(sxr AS DOUBLE) * CAST(n AS DOUBLE)" +
      " / (CAST(sx AS DOUBLE) * CAST(nr AS DOUBLE)))")
    Q("q667_theil_decomposition",
      Some(s"""
        |WITH ${sqlRev},
        |cr AS (
        |  SELECT rev.ck, rev.cents, n.n_regionkey AS rk
        |  FROM rev JOIN customer c ON c.c_custkey = rev.ck
        |       JOIN nation n ON n.n_nationkey = c.c_nationkey),
        |reg AS (SELECT rk, count(*) AS nr, sum(cents) AS sxr
        |        FROM cr GROUP BY 1),
        |tot AS (SELECT count(*) AS n, sum(cents) AS sx FROM cr),
        |terms AS (
        |  SELECT cr.rk, $tGlob AS tg, $tReg AS tr
        |  FROM cr JOIN reg ON reg.rk = cr.rk CROSS JOIN tot),
        |pr AS (
        |  SELECT t.rk, reg.nr, reg.sxr, sum(t.tg) AS stg, sum(t.tr) AS str
        |  FROM terms t JOIN reg ON reg.rk = t.rk GROUP BY 1, 2, 3)
        |SELECT CAST(pr.rk AS BIGINT) AS region,
        |       CAST(pr.nr AS BIGINT) AS n_customers,
        |       CAST((1000000 * pr.sxr) // tot.sx AS BIGINT) AS share_ppm,
        |       CAST(pr.str // pr.nr AS BIGINT) AS theil_within_micro,
        |       CAST($tBet AS BIGINT) AS between_term_micro,
        |       CAST(pr.stg // tot.n AS BIGINT) AS global_contrib_micro
        |FROM pr CROSS JOIN tot
        |ORDER BY region
        |""".stripMargin)) { (s, dir) =>
      val cr = rev(s, dir)
        .join(Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_nationkey")),
          col("ck") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)
          .select(col("n_nationkey"), col("n_regionkey").as("rk"))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("ck"), col("cents"), col("rk"))
        .materialize()
      val reg = cr.groupBy(col("rk"))
        .agg(count(lit(1)).as("nr"), sum(col("cents")).as("sxr"))
        .materialize() // 5-region dim
      val tot = cr.agg(count(lit(1)).as("n"), sum(col("cents")).as("sx"))
      val terms = cr.join(broadcast(reg), Seq("rk"))
        .crossJoin(broadcast(tot))
        .select(col("rk"), expr(tGlob).as("tg"), expr(tReg).as("tr"))
      val pr = terms.groupBy(col("rk"))
        .agg(sum(col("tg")).as("stg"), sum(col("tr")).as("str"))
        .join(broadcast(reg), Seq("rk"))
      pr.crossJoin(broadcast(tot))
        .select(col("rk").cast("long").as("region"),
          col("nr").as("n_customers"),
          expr("CAST((1000000 * sxr) div sx AS BIGINT)").as("share_ppm"),
          expr("CAST(str div nr AS BIGINT)").as("theil_within_micro"),
          expr(tBet).cast("long").as("between_term_micro"),
          expr("CAST(stg div n AS BIGINT)").as("global_contrib_micro"))
        .orderBy(col("region"))
    }
  }

  /** Palma ratio and quintile-share ratio of customer revenue: exact
    * cents shares of the top 10% vs bottom 40% (Palma) and top 20% vs
    * bottom 20% (S80/S20), with rank cuts at truncating-div counts.
    * Ranks ride the bucket-parallel globalRankCum (bucket = cents div
    * 2²⁰) — the customer dim scales with the data, so no
    * single-partition window touches it. */
  def q668: Q = Q(
    "q668_palma_quintile_shares",
    Some(s"""
      |WITH ${sqlRev},
      |rk AS (
      |  SELECT cents,
      |         row_number() OVER (ORDER BY cents, ck) AS r,
      |         count(*) OVER () AS n
      |  FROM rev),
      |aggs AS (
      |  SELECT max(n) AS n, sum(cents) AS sx,
      |         sum(CASE WHEN r <= (4 * n) // 10 THEN cents ELSE 0 END)
      |           AS b40,
      |         sum(CASE WHEN r > n - n // 10 THEN cents ELSE 0 END)
      |           AS t10,
      |         sum(CASE WHEN r <= n // 5 THEN cents ELSE 0 END) AS b20,
      |         sum(CASE WHEN r > n - n // 5 THEN cents ELSE 0 END)
      |           AS t20
      |  FROM rk)
      |SELECT CAST(n AS BIGINT) AS n_customers,
      |       CAST((1000000 * b40) // sx AS BIGINT) AS bottom40_ppm,
      |       CAST((1000000 * t10) // sx AS BIGINT) AS top10_ppm,
      |       CAST((1000 * t10) // b40 AS BIGINT) AS palma_milli,
      |       CAST((1000 * t20) // b20 AS BIGINT) AS s80_s20_milli
      |FROM aggs
      |""".stripMargin)) { (s, dir) =>
    val r = rev(s, dir)
    val n1 = r.agg(count(lit(1)).as("n"))
    val rk = graft.dedup.SortedNeighborhood.globalRankCum(
        r.withColumn("__bkt", expr("CAST(cents div 1048576 AS BIGINT)")),
        idCol = "ck", bucketCol = "__bkt", tieCols = Seq("cents"),
        partCols = Nil, cumCol = None)
      .crossJoin(broadcast(n1))
    rk.agg(max(col("n")).as("n"), sum(col("cents")).as("sx"),
        sum(when(col("__rank") <= expr("(4 * n) div 10"), col("cents"))
          .otherwise(lit(0))).as("b40"),
        sum(when(col("__rank") > expr("n - n div 10"), col("cents"))
          .otherwise(lit(0))).as("t10"),
        sum(when(col("__rank") <= expr("n div 5"), col("cents"))
          .otherwise(lit(0))).as("b20"),
        sum(when(col("__rank") > expr("n - n div 5"), col("cents"))
          .otherwise(lit(0))).as("t20"))
      .select(col("n").as("n_customers"),
        expr("CAST((1000000 * b40) div sx AS BIGINT)").as("bottom40_ppm"),
        expr("CAST((1000000 * t10) div sx AS BIGINT)").as("top10_ppm"),
        expr("CAST((1000 * t10) div b40 AS BIGINT)").as("palma_milli"),
        expr("CAST((1000 * t20) div b20 AS BIGINT)").as("s80_s20_milli"))
  }

  /** Concentration index of RETURNS against revenue rank: with
    * customers ranked by revenue and y = "had any returned line",
    * CI = 2·Σ(y·r)/(n·Σy) − (n+1)/n ∈ [−1, 1] — positive when returns
    * concentrate among high-revenue customers (the health-economics
    * concentration curve applied to order quality). Exact integer
    * Σ(y·r); one pinned double expression, milli-quantized. */
  def q669: Q = {
    val ci = "CAST(floor((2.0 * CAST(syr AS DOUBLE)" +
      " / (CAST(n AS DOUBLE) * CAST(sy AS DOUBLE))" +
      " - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE)) * 1000.0)" +
      " AS BIGINT)"
    Q("q669_returns_concentration",
      Some(s"""
        |WITH ${sqlRev},
        |yy AS (
        |  SELECT o.o_custkey AS ck,
        |         max(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
        |           AS y
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  GROUP BY 1),
        |rk AS (
        |  SELECT rev.ck, rev.cents, coalesce(yy.y, 0) AS y,
        |         row_number() OVER (ORDER BY rev.cents, rev.ck) AS r,
        |         count(*) OVER () AS n
        |  FROM rev LEFT JOIN yy ON yy.ck = rev.ck),
        |mo AS (SELECT max(n) AS n, sum(y) AS sy,
        |              sum(CAST(y AS HUGEINT) * r) AS syr FROM rk)
        |SELECT CAST(n AS BIGINT) AS n_customers,
        |       CAST(sy AS BIGINT) AS n_with_returns,
        |       $ci AS concentration_milli
        |FROM mo
        |""".stripMargin)) { (s, dir) =>
      val yy = Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"))
        .join(Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_returnflag")),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_custkey").as("yck"))
        .agg(max(when(col("l_returnflag") === "R", 1L).otherwise(0L))
          .as("y"))
      val n1 = rev(s, dir).agg(count(lit(1)).as("n"))
      val rk = graft.dedup.SortedNeighborhood.globalRankCum(
          rev(s, dir)
            .withColumn("__bkt", expr("CAST(cents div 1048576 AS BIGINT)")),
          idCol = "ck", bucketCol = "__bkt", tieCols = Seq("cents"),
          partCols = Nil, cumCol = None)
        .join(yy, col("ck") === col("yck"), "left")
        .select(col("ck"), coalesce(col("y"), lit(0L)).as("y"),
          col("__rank").as("r"))
        .crossJoin(broadcast(n1))
      rk.agg(max(col("n")).as("n"), sum(col("y")).as("sy"),
          sum(col("y").cast("decimal(38,0)") * col("r")).as("syr"))
        .select(col("n").as("n_customers"),
          col("sy").as("n_with_returns"),
          expr(ci).as("concentration_milli"))
    }
  }

  /** Year-over-year revenue-quintile mobility (1997 → 1998): customers
    * active both years get a rank-based quintile per year
    * (globalRankCum partitioned BY YEAR — one pass ranks both), the
    * transition diagonal (stayers), and the mean |Δquintile| — the
    * Shorrocks-style "how sticky is the revenue hierarchy" audit.
    * Quintiles are rank-cut ((rank−1)·5 div n_year), deterministic
    * under the (cents, custkey) tiebreak both engines state. */
  def q670: Q = Q(
    "q670_quintile_mobility",
    Some("""
      |WITH ry AS (
      |  SELECT o_custkey AS ck, year(o_orderdate) AS yr,
      |         sum(CAST(o_totalprice * 100 AS HUGEINT)) AS cents
      |  FROM orders WHERE year(o_orderdate) IN (1997, 1998)
      |  GROUP BY 1, 2),
      |rk AS (
      |  SELECT ck, yr,
      |         row_number() OVER (PARTITION BY yr ORDER BY cents, ck)
      |           AS r,
      |         count(*) OVER (PARTITION BY yr) AS ny
      |  FROM ry),
      |qs AS (SELECT ck, yr, ((r - 1) * 5) // ny AS q FROM rk),
      |tr AS (
      |  SELECT a.q AS q97, b.q AS q98
      |  FROM qs a JOIN qs b ON a.ck = b.ck
      |  WHERE a.yr = 1997 AND b.yr = 1998)
      |SELECT CAST(count(*) AS BIGINT) AS n_common,
      |       CAST(sum(CASE WHEN q97 = q98 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_stay,
      |       CAST((1000000 * sum(CASE WHEN q97 = q98 THEN 1 ELSE 0 END))
      |            // count(*) AS BIGINT) AS stay_ppm,
      |       CAST((1000 * sum(abs(q97 - q98))) // count(*) AS BIGINT)
      |         AS mean_abs_dq_milli
      |FROM tr
      |""".stripMargin)) { (s, dir) =>
    val ry = Tables.orders(s, dir)
      .where(year(col("o_orderdate")).isin(1997, 1998))
      .groupBy(col("o_custkey").as("ck"),
        year(col("o_orderdate")).as("yr"))
      .agg(sum(expr("CAST(o_totalprice * 100 AS DECIMAL(38,0))"))
        .as("cents"))
      .materialize()
    val ny = ry.groupBy(col("yr")).agg(count(lit(1)).as("ny"))
    val qs = graft.dedup.SortedNeighborhood.globalRankCum(
        ry.withColumn("__bkt", expr("CAST(cents div 1048576 AS BIGINT)")),
        idCol = "ck", bucketCol = "__bkt", tieCols = Seq("cents"),
        partCols = Seq("yr"), cumCol = None)
      .join(broadcast(ny), Seq("yr"))
      .select(col("ck"), col("yr"),
        expr("((__rank - 1) * 5) div ny").as("q"))
    val tr = qs.where(col("yr") === 1997)
      .select(col("ck"), col("q").as("q97"))
      .join(qs.where(col("yr") === 1998)
        .select(col("ck").as("ck98"), col("q").as("q98")),
        col("ck") === col("ck98"))
    tr.agg(count(lit(1)).as("n"),
        sum(when(col("q97") === col("q98"), 1L).otherwise(0L)).as("st"),
        sum(abs(col("q97") - col("q98"))).as("sd"))
      .select(col("n").as("n_common"), col("st").as("n_stay"),
        expr("(1000000 * st) div n").as("stay_ppm"),
        expr("(1000 * sd) div n").as("mean_abs_dq_milli"))
  }
}
