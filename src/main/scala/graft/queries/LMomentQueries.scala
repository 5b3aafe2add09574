package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables
import graft.dedup.SortedNeighborhood

/** Round-9 L-moment wave on order values: Hosking's order-statistic
  * moments computed EXACTLY from rank sums — λ1/λ2 and the Gini mean
  * difference, L-skewness τ3, L-kurtosis τ4, the L-CV (= the Gini
  * coefficient for positive variables), and the per-market-segment
  * (τ3, τ4) L-moment-ratio diagram.
  *
  * Scale: the sample ranks ride the bucket-parallel
  * [[SortedNeighborhood.globalRankCum]] spine (bucket = value div 10⁶,
  * ties broken by (value, orderkey)) — no fact-scaled single-partition
  * window. The probability-weighted moments b₀..b₃ are exact
  * DECIMAL(38,0)/HUGEINT falling-factorial rank sums; every λ/τ is an
  * integer rational with one pinned double at most. */
object LMomentQueries {

  val all: Seq[Q] = Seq(q831, q832, q833, q834, q835)

  private def sqlBm: String = """
    |x AS (SELECT o_orderkey AS k,
    |             CAST(o_totalprice * 100 AS BIGINT) AS v FROM orders),
    |rk AS (SELECT v, row_number() OVER (ORDER BY v, k) AS i FROM x),
    |bm AS (
    |  SELECT count(*) AS n, sum(CAST(v AS HUGEINT)) AS b0n,
    |         sum(CAST(i - 1 AS HUGEINT) * v) AS b1n,
    |         sum(CAST(i - 1 AS HUGEINT) * (i - 2) * v) AS b2n,
    |         sum(CAST(i - 1 AS HUGEINT) * (i - 2) * (i - 3) * v) AS b3n
    |  FROM rk)""".stripMargin

  /** Spark PWM aggregate row (n, b0n..b3n) via the rank spine. */
  private def bmBase(s: SparkSession, dir: String): DataFrame = {
    val x = Tables.orders(s, dir)
      .select(col("o_orderkey").as("k"),
        expr("CAST(CAST(o_totalprice * 100 AS DECIMAL(38,0)) AS LONG)")
          .as("v"))
      .withColumn("vb", expr("v div 1000000"))
    SortedNeighborhood.globalRankCum(x, "k", "vb", Seq("v"))
      .select(col("v").cast("decimal(38,0)").as("v"),
        col("__rank").cast("decimal(38,0)").as("i"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("b0n"),
        sum((col("i") - 1) * col("v")).as("b1n"),
        sum((col("i") - 1) * (col("i") - 2) * col("v")).as("b2n"),
        sum((col("i") - 1) * (col("i") - 2) * (col("i") - 3) * col("v"))
          .as("b3n"))
  }

  /** λ1 (mean), λ2, and the Gini mean difference 2λ2 — exact integer
    * rationals from the PWM rank sums. */
  def q831: Q = Q(
    "q831_l_moments_scale",
    Some(s"""
      |WITH ${sqlBm}
      |SELECT CAST(n AS BIGINT) AS n,
      |       CAST(b0n // n AS BIGINT) AS l1_cents,
      |       CAST((1000 * (2 * b1n - (n - 1) * b0n)) // (n * (n - 1))
      |            AS BIGINT) AS l2_milli_cents,
      |       CAST((2 * (2 * b1n - (n - 1) * b0n)) // (n * (n - 1))
      |            AS BIGINT) AS gmd_cents
      |FROM bm
      |""".stripMargin)) { (s, dir) =>
    bmBase(s, dir)
      .select(col("n").cast("long").as("n"),
        expr("CAST((b0n - b0n % n) / n AS DECIMAL(38,0))").cast("long")
          .as("l1_cents"),
        expr("""CAST((1000 * (2 * b1n - (n - 1) * b0n)
          |  - (1000 * (2 * b1n - (n - 1) * b0n)) % (n * (n - 1)))
          |  / (n * (n - 1)) AS DECIMAL(38,0))""".stripMargin)
          .cast("long").as("l2_milli_cents"),
        expr("""CAST((2 * (2 * b1n - (n - 1) * b0n)
          |  - (2 * (2 * b1n - (n - 1) * b0n)) % (n * (n - 1)))
          |  / (n * (n - 1)) AS DECIMAL(38,0))""".stripMargin)
          .cast("long").as("gmd_cents"))
  }

  // defs, not vals: `val all` at the top of the object evaluates the
  // query defs during object init, BEFORE any later val would be
  // assigned — a val here interpolates as "null" into the oracle SQL.
  private def tau3Sql = """floor(1000.0
    | * CAST(6 * b2n - 6 * (n - 2) * b1n + (n - 1) * (n - 2) * b0n
    |        AS DOUBLE)
    | / ((n - 2) * CAST(2 * b1n - (n - 1) * b0n AS DOUBLE)))"""
    .stripMargin

  private def tau4Sql = """floor(1000.0
    | * CAST(20 * b3n - 30 * (n - 3) * b2n
    |        + 12 * (n - 2) * (n - 3) * b1n
    |        - (n - 1) * (n - 2) * (n - 3) * b0n AS DOUBLE)
    | / (CAST((n - 2) * (n - 3) AS DOUBLE)
    |    * CAST(2 * b1n - (n - 1) * b0n AS DOUBLE)))""".stripMargin

  /** L-skewness τ3 = λ3/λ2. */
  def q832: Q = Q(
    "q832_l_skewness",
    Some(s"""
      |WITH ${sqlBm}
      |SELECT CAST(n AS BIGINT) AS n,
      |       CAST(${tau3Sql} AS BIGINT) AS tau3_milli
      |FROM bm
      |""".stripMargin)) { (s, dir) =>
    bmBase(s, dir)
      .select(col("n").cast("long").as("n"),
        expr(s"CAST(${tau3Sql} AS BIGINT)").as("tau3_milli"))
  }

  /** L-kurtosis τ4 = λ4/λ2. */
  def q833: Q = Q(
    "q833_l_kurtosis",
    Some(s"""
      |WITH ${sqlBm}
      |SELECT CAST(n AS BIGINT) AS n,
      |       CAST(${tau4Sql} AS BIGINT) AS tau4_milli
      |FROM bm
      |""".stripMargin)) { (s, dir) =>
    bmBase(s, dir)
      .select(col("n").cast("long").as("n"),
        expr(s"CAST(${tau4Sql} AS BIGINT)").as("tau4_milli"))
  }

  /** L-CV λ2/λ1 — the Gini coefficient of the (positive) order
    * values, via the L-moment identity. */
  def q834: Q = Q(
    "q834_l_cv_gini",
    Some(s"""
      |WITH ${sqlBm}
      |SELECT CAST(n AS BIGINT) AS n,
      |       CAST(floor(1000.0 * CAST(2 * b1n - (n - 1) * b0n AS DOUBLE)
      |            / ((n - 1) * CAST(b0n AS DOUBLE))) AS BIGINT)
      |         AS lcv_gini_milli
      |FROM bm
      |""".stripMargin)) { (s, dir) =>
    bmBase(s, dir)
      .select(col("n").cast("long").as("n"),
        expr("""CAST(floor(1000.0 * CAST(2 * b1n - (n - 1) * b0n AS DOUBLE)
          |  / ((n - 1) * CAST(b0n AS DOUBLE))) AS BIGINT)"""
          .stripMargin).as("lcv_gini_milli"))
  }

  /** Per-market-segment L-moment-ratio diagram point (τ3, τ4): the
    * distribution-shape fingerprint per segment, partitioned ranks. */
  def q835: Q = Q(
    "q835_l_ratio_diagram",
    Some("""
      |WITH x AS (
      |  SELECT c.c_mktsegment AS seg, o.o_orderkey AS k,
      |         CAST(o.o_totalprice * 100 AS BIGINT) AS v
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
      |rk AS (SELECT seg, v, row_number() OVER (PARTITION BY seg
      |         ORDER BY v, k) AS i FROM x),
      |bm AS (
      |  SELECT seg, count(*) AS n, sum(CAST(v AS HUGEINT)) AS b0n,
      |         sum(CAST(i - 1 AS HUGEINT) * v) AS b1n,
      |         sum(CAST(i - 1 AS HUGEINT) * (i - 2) * v) AS b2n,
      |         sum(CAST(i - 1 AS HUGEINT) * (i - 2) * (i - 3) * v) AS b3n
      |  FROM rk GROUP BY 1)
      |SELECT seg AS segment, CAST(n AS BIGINT) AS n,
      |       CAST(floor(1000.0
      |         * CAST(6 * b2n - 6 * (n - 2) * b1n
      |                + (n - 1) * (n - 2) * b0n AS DOUBLE)
      |         / ((n - 2) * CAST(2 * b1n - (n - 1) * b0n AS DOUBLE)))
      |         AS BIGINT) AS tau3_milli,
      |       CAST(floor(1000.0
      |         * CAST(20 * b3n - 30 * (n - 3) * b2n
      |                + 12 * (n - 2) * (n - 3) * b1n
      |                - (n - 1) * (n - 2) * (n - 3) * b0n AS DOUBLE)
      |         / (CAST((n - 2) * (n - 3) AS DOUBLE)
      |            * CAST(2 * b1n - (n - 1) * b0n AS DOUBLE)))
      |         AS BIGINT) AS tau4_milli
      |FROM bm ORDER BY segment
      |""".stripMargin)) { (s, dir) =>
    val x = Tables.orders(s, dir)
      .select(col("o_orderkey").as("k"), col("o_custkey"),
        expr("CAST(CAST(o_totalprice * 100 AS DECIMAL(38,0)) AS LONG)")
          .as("v"))
      .join(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment").as("seg")),
        col("c_custkey") === col("o_custkey"))
      .withColumn("vb", expr("v div 1000000"))
    SortedNeighborhood.globalRankCum(x, "k", "vb", Seq("v"),
        partCols = Seq("seg"))
      .select(col("seg"), col("v").cast("decimal(38,0)").as("v"),
        col("__rank").cast("decimal(38,0)").as("i"))
      .groupBy(col("seg"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("b0n"),
        sum((col("i") - 1) * col("v")).as("b1n"),
        sum((col("i") - 1) * (col("i") - 2) * col("v")).as("b2n"),
        sum((col("i") - 1) * (col("i") - 2) * (col("i") - 3) * col("v"))
          .as("b3n"))
      .select(col("seg").as("segment"), col("n").cast("long").as("n"),
        expr(s"CAST(${tau3Sql} AS BIGINT)").as("tau3_milli"),
        expr(s"CAST(${tau4Sql} AS BIGINT)").as("tau4_milli"))
      .orderBy(col("segment"))
  }
}
