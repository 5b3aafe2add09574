package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Materialize.MatOps
import graft.Tables

/** Round-9 renewal-theory wave on customer inter-order gaps: the
  * inspection paradox (length-biased vs plain mean gap), the
  * elementary-renewal expansion m(t) ≈ t/μ + σ²/(2μ²) − ½, the
  * forward-recurrence (residual life) check at a census date against
  * the E[X²]/2E[X] theory value, per-customer regularity classes via
  * exact CV² integer inequalities, and a first-half/second-half gap
  * drift audit.
  *
  * Scale: gaps come from a lag window PARTITIONED BY customer (scale-
  * safe); all moments are exact integer day sums; the census residual
  * is two per-customer min/max aggregates joined on key. Spark
  * datediff(end, start) vs DuckDB datediff('day', start, end)
  * argument order is pinned on both sides. */
object RenewalQueries {

  val all: Seq[Q] = Seq(q886, q887, q888, q889, q890)

  private def sqlGp: String = """
    |gp AS (
    |  SELECT o_custkey AS k, o_orderdate AS d, o_orderkey AS ok,
    |         datediff('day', lag(o_orderdate) OVER w, o_orderdate) AS g
    |  FROM orders
    |  WINDOW w AS (PARTITION BY o_custkey
    |               ORDER BY o_orderdate, o_orderkey)
    |  QUALIFY g IS NOT NULL),
    |mo AS (SELECT count(*) AS n, sum(CAST(g AS HUGEINT)) AS s,
    |              sum(CAST(g AS HUGEINT) * g) AS q FROM gp)"""
    .stripMargin

  private def gpBase(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_custkey").as("k"), col("o_orderdate").as("d"),
        col("o_orderkey").as("ok"),
        datediff(col("o_orderdate"),
          lag(col("o_orderdate"), 1).over(w)).as("g"))
      .where(col("g").isNotNull)
  }

  private def moBase(gp: DataFrame): DataFrame =
    gp.select(col("g").cast("decimal(38,0)").as("gd"))
      .agg(count(lit(1)).as("n"), sum(col("gd")).as("s"),
        sum(col("gd") * col("gd")).as("q"))

  /** Inspection paradox: plain vs length-biased mean gap and the
    * paradox ratio n·E[X²]/E[X]². */
  def q886: Q = Q(
    "q886_inspection_paradox",
    Some(s"""
      |WITH ${sqlGp}
      |SELECT CAST(n AS BIGINT) AS n_gaps,
      |       CAST(s // n AS BIGINT) AS mean_gap_days,
      |       CAST((1000 * q) // s AS BIGINT)
      |         AS length_biased_mean_milli,
      |       CAST((1000 * q * n) // (s * s) AS BIGINT)
      |         AS paradox_ratio_milli
      |FROM mo
      |""".stripMargin)) { (s, dir) =>
    moBase(gpBase(s, dir))
      .select(col("n").cast("long").as("n_gaps"),
        expr("CAST((s - s % n) / n AS DECIMAL(38,0))").cast("long")
          .as("mean_gap_days"),
        expr("CAST((1000 * q - (1000 * q) % s) / s AS DECIMAL(38,0))")
          .cast("long").as("length_biased_mean_milli"),
        expr("CAST((1000 * q * n - (1000 * q * n) % (s * s)) / (s * s)" +
          " AS DECIMAL(38,0))").cast("long").as("paradox_ratio_milli"))
  }

  /** Elementary renewal expansion at t = 365 days:
    * m(t) ≈ t/μ + σ²/(2μ²) − ½, all from exact gap moments. */
  def q887: Q = Q(
    "q887_renewal_function",
    Some(s"""
      |WITH ${sqlGp}
      |SELECT CAST(n AS BIGINT) AS n_gaps,
      |       CAST(floor(1000.0 * (365.0
      |            / (CAST(s AS DOUBLE) / n)
      |            + (CAST(n * q - s * s AS DOUBLE)
      |               / (CAST(n AS DOUBLE) * (n - 1)))
      |              / (2.0 * (CAST(s AS DOUBLE) / n)
      |                 * (CAST(s AS DOUBLE) / n)) - 0.5)) AS BIGINT)
      |         AS renewals_365d_milli
      |FROM mo
      |""".stripMargin)) { (s, dir) =>
    moBase(gpBase(s, dir))
      .select(col("n").cast("long").as("n_gaps"),
        expr("""CAST(floor(1000.0 * (365.0 / (CAST(s AS DOUBLE) / n)
          |  + (CAST(n * q - s * s AS DOUBLE)
          |     / (CAST(n AS DOUBLE) * (n - 1)))
          |    / (2.0 * (CAST(s AS DOUBLE) / n)
          |       * (CAST(s AS DOUBLE) / n)) - 0.5)) AS BIGINT)"""
          .stripMargin).as("renewals_365d_milli"))
  }

  /** Forward recurrence at the 2000-01-01 census: empirical mean
    * residual (customers with orders straddling the date) vs the
    * theory value E[X²]/2E[X]. */
  def q888: Q = Q(
    "q888_residual_life_census",
    Some(s"""
      |WITH ${sqlGp},
      |nx AS (SELECT o_custkey, min(o_orderdate) AS nxt FROM orders
      |       WHERE o_orderdate >= TIMESTAMP '2000-01-01' GROUP BY 1),
      |pv AS (SELECT o_custkey FROM orders
      |       WHERE o_orderdate < TIMESTAMP '2000-01-01' GROUP BY 1),
      |sp AS (SELECT datediff('day', TIMESTAMP '2000-01-01', nx.nxt)
      |         AS res
      |       FROM nx JOIN pv ON pv.o_custkey = nx.o_custkey),
      |em AS (SELECT count(*) AS nc, sum(CAST(res AS HUGEINT)) AS sr
      |       FROM sp)
      |SELECT CAST(em.nc AS BIGINT) AS n_straddling,
      |       CAST((1000 * em.sr) // em.nc AS BIGINT)
      |         AS mean_residual_milli,
      |       CAST((1000 * mo.q) // (2 * mo.s) AS BIGINT)
      |         AS theory_residual_milli
      |FROM em CROSS JOIN mo
      |""".stripMargin)) { (s, dir) =>
    val mo = moBase(gpBase(s, dir))
    val census = expr("TIMESTAMP '2000-01-01'")
    val o = Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderdate")).materialize()
    val nx = o.where(col("o_orderdate") >= census)
      .groupBy(col("o_custkey")).agg(min(col("o_orderdate")).as("nxt"))
    val pv = o.where(col("o_orderdate") < census)
      .select(col("o_custkey").as("k2")).distinct()
    val em = nx.join(pv, col("o_custkey") === col("k2"))
      .select(datediff(col("nxt"), expr("DATE '2000-01-01'"))
        .cast("decimal(38,0)").as("res"))
      .agg(count(lit(1)).as("nc"), sum(col("res")).as("sr"))
    em.crossJoin(broadcast(mo))
      .select(col("nc").cast("long").as("n_straddling"),
        expr("CAST((1000 * sr - (1000 * sr) % nc) / nc" +
          " AS DECIMAL(38,0))").cast("long").as("mean_residual_milli"),
        expr("CAST((1000 * q - (1000 * q) % (2 * s)) / (2 * s)" +
          " AS DECIMAL(38,0))").cast("long")
          .as("theory_residual_milli"))
  }

  /** Per-customer regularity classes (≥3 gaps): CV² < ½ regular,
    * < 1 intermittent, else erratic — exact integer inequalities
    * 2n(nQ−S²) ⋚ (n−1)S² and n(nQ−S²) ⋚ (n−1)S². */
  def q889: Q = Q(
    "q889_regularity_classes",
    Some(s"""
      |WITH ${sqlGp},
      |pc AS (SELECT k, count(*) AS n, sum(CAST(g AS HUGEINT)) AS s,
      |              sum(CAST(g AS HUGEINT) * g) AS q
      |       FROM gp GROUP BY 1 HAVING count(*) >= 3),
      |cl AS (SELECT
      |  CASE WHEN 2 * n * (n * q - s * s) < (n - 1) * s * s
      |         THEN 'regular'
      |       WHEN n * (n * q - s * s) < (n - 1) * s * s
      |         THEN 'intermittent'
      |       ELSE 'erratic' END AS cls
      |  FROM pc)
      |SELECT cls, CAST(count(*) AS BIGINT) AS n_customers
      |FROM cl GROUP BY 1 ORDER BY cls
      |""".stripMargin)) { (s, dir) =>
    gpBase(s, dir)
      .select(col("k"), col("g").cast("decimal(38,0)").as("gd"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("gd")).as("s"),
        sum(col("gd") * col("gd")).as("q"))
      .where(col("n") >= 3)
      .select(
        when(expr("2 * n * (n * q - s * s)") < expr("(n - 1) * s * s"),
          "regular")
          .when(expr("n * (n * q - s * s)") < expr("(n - 1) * s * s"),
            "intermittent")
          .otherwise("erratic").as("cls"))
      .groupBy(col("cls")).agg(count(lit(1)).as("nc"))
      .select(col("cls"), col("nc").cast("long").as("n_customers"))
      .orderBy(col("cls"))
  }

  /** Gap drift: global mean gap over each customer's first half of
    * gaps vs second half — a lengthening ratio > 1 flags slowdown. */
  def q890: Q = Q(
    "q890_gap_drift",
    Some(s"""
      |WITH ${sqlGp},
      |og AS (
      |  SELECT k, g, row_number() OVER (PARTITION BY k
      |           ORDER BY d, ok) AS r,
      |         count(*) OVER (PARTITION BY k) AS nk
      |  FROM gp),
      |hv AS (
      |  SELECT sum(CASE WHEN 2 * r <= nk THEN CAST(g AS HUGEINT)
      |             ELSE 0 END) AS s1,
      |         sum(CASE WHEN 2 * r <= nk THEN 1 ELSE 0 END) AS n1,
      |         sum(CASE WHEN 2 * r > nk THEN CAST(g AS HUGEINT)
      |             ELSE 0 END) AS s2,
      |         sum(CASE WHEN 2 * r > nk THEN 1 ELSE 0 END) AS n2
      |  FROM og)
      |SELECT CAST(n1 AS BIGINT) AS n_first, CAST(n2 AS BIGINT)
      |         AS n_second,
      |       CAST((1000 * s1) // n1 AS BIGINT) AS mean_first_milli,
      |       CAST((1000 * s2) // n2 AS BIGINT) AS mean_second_milli,
      |       CAST((1000 * s2 * n1) // (s1 * n2) AS BIGINT)
      |         AS drift_ratio_milli
      |FROM hv
      |""".stripMargin)) { (s, dir) =>
    val w = Window.partitionBy(col("k"))
    gpBase(s, dir)
      .select(col("g").cast("decimal(38,0)").as("gd"),
        row_number().over(w.orderBy(col("d"), col("ok"))).as("r"),
        count(lit(1)).over(w).as("nk"))
      .agg(
        sum(when(col("r") * 2 <= col("nk"), col("gd")).otherwise(0))
          .as("s1"),
        sum(when(col("r") * 2 <= col("nk"), 1).otherwise(0)).as("n1"),
        sum(when(col("r") * 2 > col("nk"), col("gd")).otherwise(0))
          .as("s2"),
        sum(when(col("r") * 2 > col("nk"), 1).otherwise(0)).as("n2"))
      .select(col("n1").cast("long").as("n_first"),
        col("n2").cast("long").as("n_second"),
        expr("CAST((1000 * s1 - (1000 * s1) % n1) / n1" +
          " AS DECIMAL(38,0))").cast("long").as("mean_first_milli"),
        expr("CAST((1000 * s2 - (1000 * s2) % n2) / n2" +
          " AS DECIMAL(38,0))").cast("long").as("mean_second_milli"),
        expr("CAST((1000 * s2 * n1 - (1000 * s2 * n1) % (s1 * n2))" +
          " / (s1 * n2) AS DECIMAL(38,0))").cast("long")
          .as("drift_ratio_milli"))
  }
}
