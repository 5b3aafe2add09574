package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Materialize.MatOps
import graft.Tables

/** Round-9 growth-curve wave on the customer-adoption series (first
  * order month per customer, cumulative adopters by month): logistic
  * and Gompertz linearized fits against the known ceiling K = N+1,
  * the early-phase exponential doubling time, decile onset months,
  * and adoption-dormancy spacing statistics.
  *
  * Scale: the adoption series is one fact pass (min order month per
  * customer — a single groupBy) reduced to a ≤83-month calendar dim;
  * windows over it are constant-size at every sf. Both linearized
  * fits use the established DECIMAL(18,9) ln-term quantization before
  * exact decimal sums; the OLS slope/intercept are the only pinned
  * doubles. K = N+1 keeps every logit argument finite (cum ≤ N < K). */
object GrowthQueries {

  val all: Seq[Q] = Seq(q811, q812, q813, q814, q815)

  private def sqlAd: String = """
    |fo AS (SELECT o_custkey,
    |              min((year(o_orderdate) - 1995) * 12
    |                  + month(o_orderdate) - 1) AS m0
    |       FROM orders GROUP BY 1),
    |gl AS (SELECT count(*) AS nc FROM fo),
    |ad AS (SELECT m0 AS m, count(*) AS nw FROM fo GROUP BY 1),
    |cm AS (SELECT m, nw, sum(nw) OVER (ORDER BY m) AS cum FROM ad)"""
    .stripMargin

  /** Spark adoption series (m, nw, cum) + broadcastable total. */
  private def cmBase(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val fo = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(min((year(col("o_orderdate")) - 1995) * 12
        + month(col("o_orderdate")) - 1).as("m0"))
    val ad = fo.groupBy(col("m0").as("m")).agg(count(lit(1)).as("nw"))
      .materialize()
    val cm = ad.select(col("m"), col("nw"),
      sum(col("nw")).over(Window.orderBy(col("m"))).as("cum"))
    val gl = ad.agg(sum(col("nw")).as("nc"))
    (cm, gl)
  }

  private def olsCols(xExpr: String, yExpr: String): Seq[String] = Seq(
    s"count(*) AS n", s"sum($xExpr) AS sx", s"sum($yExpr) AS sy",
    s"sum(($xExpr) * ($yExpr)) AS sxy", s"sum(($xExpr) * ($xExpr)) AS sxx")

  /** Logistic linearization: logit(cum/K) regressed on month — slope
    * is the intrinsic growth rate r, t₀ = −a/r the midpoint. */
  def q811: Q = Q(
    "q811_logistic_fit",
    Some(s"""
      |WITH ${sqlAd},
      |lt AS (
      |  SELECT CAST(m AS DECIMAL(18,9)) AS x,
      |         CAST(ln(CAST(cum AS DOUBLE) / (gl.nc + 1 - cum))
      |              AS DECIMAL(18,9)) AS y
      |  FROM cm CROSS JOIN gl),
      |mo AS (SELECT ${olsCols("x", "y").mkString(", ")} FROM lt)
      |SELECT CAST(n AS BIGINT) AS n_points,
      |       CAST(floor(1000.0 * CAST(n * sxy - sx * sy AS DOUBLE)
      |            / CAST(n * sxx - sx * sx AS DOUBLE)) AS BIGINT)
      |         AS growth_rate_milli,
      |       CAST(floor(1000.0 *
      |         (-(CAST(sy AS DOUBLE) / n
      |            - (CAST(n * sxy - sx * sy AS DOUBLE)
      |               / CAST(n * sxx - sx * sx AS DOUBLE))
      |              * CAST(sx AS DOUBLE) / n)
      |          / (CAST(n * sxy - sx * sy AS DOUBLE)
      |             / CAST(n * sxx - sx * sx AS DOUBLE))))
      |         AS BIGINT) AS midpoint_month_milli
      |FROM mo
      |""".stripMargin)) { (s, dir) =>
    val (cm, gl) = cmBase(s, dir)
    cm.crossJoin(broadcast(gl))
      .select(col("m").cast("decimal(18,9)").as("x"),
        expr("CAST(ln(CAST(cum AS DOUBLE) / (nc + 1 - cum))" +
          " AS DECIMAL(18,9))").as("y"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("n").cast("long").as("n_points"),
        expr("""CAST(floor(1000.0 * CAST(n * sxy - sx * sy AS DOUBLE)
          |  / CAST(n * sxx - sx * sx AS DOUBLE)) AS BIGINT)"""
          .stripMargin).as("growth_rate_milli"),
        expr("""CAST(floor(1000.0 *
          |  (-(CAST(sy AS DOUBLE) / n
          |     - (CAST(n * sxy - sx * sy AS DOUBLE)
          |        / CAST(n * sxx - sx * sx AS DOUBLE))
          |       * CAST(sx AS DOUBLE) / n)
          |   / (CAST(n * sxy - sx * sy AS DOUBLE)
          |      / CAST(n * sxx - sx * sx AS DOUBLE)))) AS BIGINT)"""
          .stripMargin).as("midpoint_month_milli"))
  }

  /** Gompertz linearization: ln(−ln(cum/K)) on month; slope is −c
    * (the decay of the log-deficit). */
  def q812: Q = Q(
    "q812_gompertz_fit",
    Some(s"""
      |WITH ${sqlAd},
      |lt AS (
      |  SELECT CAST(m AS DECIMAL(18,9)) AS x,
      |         CAST(ln(-ln(CAST(cum AS DOUBLE) / (gl.nc + 1)))
      |              AS DECIMAL(18,9)) AS y
      |  FROM cm CROSS JOIN gl),
      |mo AS (SELECT ${olsCols("x", "y").mkString(", ")} FROM lt)
      |SELECT CAST(n AS BIGINT) AS n_points,
      |       CAST(floor(1000.0 * CAST(n * sxy - sx * sy AS DOUBLE)
      |            / CAST(n * sxx - sx * sx AS DOUBLE)) AS BIGINT)
      |         AS gompertz_slope_milli
      |FROM mo
      |""".stripMargin)) { (s, dir) =>
    val (cm, gl) = cmBase(s, dir)
    cm.crossJoin(broadcast(gl))
      .select(col("m").cast("decimal(18,9)").as("x"),
        expr("CAST(ln(-ln(CAST(cum AS DOUBLE) / (nc + 1)))" +
          " AS DECIMAL(18,9))").as("y"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("n").cast("long").as("n_points"),
        expr("""CAST(floor(1000.0 * CAST(n * sxy - sx * sy AS DOUBLE)
          |  / CAST(n * sxx - sx * sx AS DOUBLE)) AS BIGINT)"""
          .stripMargin).as("gompertz_slope_milli"))
  }

  /** Early-phase exponential doubling time: ln(cum) on month over the
    * first 12 observed adoption months; doubling = ln2/slope. */
  def q813: Q = Q(
    "q813_doubling_time",
    Some(s"""
      |WITH ${sqlAd},
      |rk AS (SELECT m, cum, row_number() OVER (ORDER BY m) AS r FROM cm),
      |lt AS (
      |  SELECT CAST(m AS DECIMAL(18,9)) AS x,
      |         CAST(ln(CAST(cum AS DOUBLE)) AS DECIMAL(18,9)) AS y
      |  FROM rk WHERE r <= 12),
      |mo AS (SELECT ${olsCols("x", "y").mkString(", ")} FROM lt)
      |SELECT CAST(n AS BIGINT) AS n_points,
      |       CAST(floor(1000000.0 * CAST(n * sxy - sx * sy AS DOUBLE)
      |            / CAST(n * sxx - sx * sx AS DOUBLE)) AS BIGINT)
      |         AS early_rate_micro,
      |       CAST(floor(1000.0 * ln(2.0)
      |            / (CAST(n * sxy - sx * sy AS DOUBLE)
      |               / CAST(n * sxx - sx * sx AS DOUBLE))) AS BIGINT)
      |         AS doubling_months_milli
      |FROM mo
      |""".stripMargin)) { (s, dir) =>
    val (cm, _) = cmBase(s, dir)
    cm.select(col("m"), col("cum"),
        row_number().over(Window.orderBy(col("m"))).as("r"))
      .where(col("r") <= 12)
      .select(col("m").cast("decimal(18,9)").as("x"),
        expr("CAST(ln(CAST(cum AS DOUBLE)) AS DECIMAL(18,9))").as("y"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("n").cast("long").as("n_points"),
        expr("""CAST(floor(1000000.0 * CAST(n * sxy - sx * sy AS DOUBLE)
          |  / CAST(n * sxx - sx * sx AS DOUBLE)) AS BIGINT)"""
          .stripMargin).as("early_rate_micro"),
        expr("""CAST(floor(1000.0 * ln(2.0)
          |  / (CAST(n * sxy - sx * sy AS DOUBLE)
          |     / CAST(n * sxx - sx * sx AS DOUBLE))) AS BIGINT)"""
          .stripMargin).as("doubling_months_milli"))
  }

  /** Decile onset months: for each adoption decile d/10, the first
    * month where cumulative adopters reach it. */
  def q814: Q = Q(
    "q814_adoption_deciles",
    Some(s"""
      |WITH ${sqlAd},
      |dd AS (SELECT * FROM (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9))
      |       AS v(d))
      |SELECT CAST(dd.d AS BIGINT) AS decile,
      |       CAST(min(cm.m) AS BIGINT) AS onset_month
      |FROM dd JOIN cm ON 10 * cm.cum >= dd.d * (SELECT nc FROM gl)
      |GROUP BY dd.d ORDER BY decile
      |""".stripMargin)) { (s, dir) =>
    val (cm, gl) = cmBase(s, dir)
    val dd = cm.sparkSession.range(1, 10).select(col("id").as("d"))
    broadcast(dd)
      .join(cm.crossJoin(broadcast(gl)),
        col("cum") * 10 >= col("d") * col("nc"))
      .groupBy(col("d"))
      .agg(min(col("m")).as("onset"))
      .select(col("d").cast("long").as("decile"),
        col("onset").cast("long").as("onset_month"))
      .orderBy(col("decile"))
  }

  /** Adoption-dormancy spacing: gaps between consecutive adoption
    * months — active-month count, mean gap (milli), max dormancy. */
  def q815: Q = Q(
    "q815_adoption_dormancy",
    Some(s"""
      |WITH ${sqlAd},
      |gp AS (
      |  SELECT m - lag(m) OVER (ORDER BY m) AS gap FROM cm),
      |mo AS (SELECT count(*) AS ng, sum(gap) AS sg, max(gap) AS mg
      |       FROM gp WHERE gap IS NOT NULL)
      |SELECT CAST((SELECT count(*) FROM cm) AS BIGINT) AS n_active_months,
      |       CAST((1000 * sg) // ng AS BIGINT) AS mean_gap_milli,
      |       CAST(mg AS BIGINT) AS max_dormancy
      |FROM mo
      |""".stripMargin)) { (s, dir) =>
    val (cm, _) = cmBase(s, dir)
    val cmM = cm.materialize()
    val gp = cmM
      .select((col("m") - lag(col("m"), 1).over(Window.orderBy(col("m"))))
        .as("gap"))
      .where(col("gap").isNotNull)
      .agg(count(lit(1)).as("ng"), sum(col("gap")).as("sg"),
        max(col("gap")).as("mg"))
    val n = cmM.agg(count(lit(1)).as("nm"))
    gp.crossJoin(broadcast(n))
      .select(col("nm").cast("long").as("n_active_months"),
        expr("CAST((1000 * sg) div ng AS BIGINT)").as("mean_gap_milli"),
        col("mg").cast("long").as("max_dormancy"))
  }
}
