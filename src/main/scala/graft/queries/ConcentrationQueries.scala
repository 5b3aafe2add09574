package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables
import graft.dedup.SortedNeighborhood

/** Round-9 market-concentration completion wave on supplier revenue
  * shares, extending the shipped HHI/Gini/Lorenz battery with the
  * industrial-organization index family: the Hall-Tideman/Rosenbluth
  * rank-weighted index, the Hannah-Kay α-family (α = ½, 2, 3) with
  * its numbers-equivalent reading, CR4/CR8/CR20 concentration ratios,
  * the Linda index curve (m = 2..5), and the Theil-entropy
  * concentration trio.
  *
  * Scale: one fact pass builds supplier revenue; ranks/cums ride the
  * bucket-parallel [[SortedNeighborhood.globalRankCum]] spine. Moment
  * sums are exact decimals; √x and ln x terms use the established
  * DECIMAL(18,9) per-row quantization before exact sums; Linda terms
  * are exact integer rationals micro-floored BEFORE the per-m mean.
  * CR_k is defined through max(cum | rank ≤ k), so a corpus with
  * fewer than k suppliers degrades to the full total, keeping the
  * output shape scale-invariant. */
object ConcentrationQueries {

  val all: Seq[Q] = Seq(q841, q842, q843, q844, q845)

  private def sqlBase: String = """
    |sv AS (SELECT l_suppkey AS s,
    |              sum(CAST(l_extendedprice * 100 AS BIGINT)) AS x
    |       FROM lineitem GROUP BY 1),
    |gl AS (SELECT count(*) AS ns, sum(CAST(x AS HUGEINT)) AS t,
    |              sum(CAST(x AS HUGEINT) * x) AS q2,
    |              sum(CAST(x AS HUGEINT) * x * x) AS q3 FROM sv),
    |rk AS (SELECT s, x, row_number() OVER (ORDER BY x DESC, s) AS i,
    |              sum(CAST(x AS HUGEINT)) OVER (ORDER BY x DESC, s)
    |                AS cum FROM sv)""".stripMargin

  private def svBase(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_suppkey").as("s"),
        expr("CAST(CAST(l_extendedprice * 100 AS DECIMAL(38,0)) AS LONG)")
          .as("v"))
      .groupBy(col("s"))
      .agg(sum(col("v")).as("x"))

  private def glBase(sv: DataFrame): DataFrame =
    sv.select(col("x").cast("decimal(38,0)").as("x"))
      .agg(count(lit(1)).as("ns"), sum(col("x")).as("t"),
        sum(col("x") * col("x")).as("q2"),
        sum(col("x") * col("x") * col("x")).as("q3"))

  private def rkBase(sv: DataFrame): DataFrame = {
    val in = sv.withColumn("nb", expr("-(x div 1000000)"))
      .withColumn("nx", -col("x"))
    SortedNeighborhood.globalRankCum(in, "s", "nb", Seq("nx"),
      cumCol = Some("x"))
      .select(col("s"), col("x"), col("__rank").as("i"),
        col("__cum").cast("decimal(38,0)").as("cum"))
  }

  /** Hall-Tideman/Rosenbluth index: T/(2Σi·xᵢ − T) in micro. */
  def q841: Q = Q(
    "q841_hall_tideman",
    Some(s"""
      |WITH ${sqlBase},
      |ht AS (SELECT sum(CAST(i AS HUGEINT) * x) AS six FROM rk)
      |SELECT CAST(gl.ns AS BIGINT) AS n_suppliers,
      |       CAST(floor(1000000.0 * CAST(gl.t AS DOUBLE)
      |            / (2.0 * CAST(ht.six AS DOUBLE)
      |               - CAST(gl.t AS DOUBLE))) AS BIGINT)
      |         AS hall_tideman_micro
      |FROM gl CROSS JOIN ht
      |""".stripMargin)) { (s, dir) =>
    val sv = svBase(s, dir).materialize()
    val ht = rkBase(sv)
      .agg(sum(col("i").cast("decimal(38,0)") * col("x")).as("six"))
    glBase(sv).crossJoin(broadcast(ht))
      .select(col("ns").cast("long").as("n_suppliers"),
        expr("""CAST(floor(1000000.0 * CAST(t AS DOUBLE)
          |  / (2.0 * CAST(six AS DOUBLE) - CAST(t AS DOUBLE)))
          |  AS BIGINT)""".stripMargin).as("hall_tideman_micro"))
  }

  /** Hannah-Kay α-family in numbers-equivalent form: α = ½ (spread-
    * sensitive), α = 2 (inverse HHI), α = 3 (top-sensitive). */
  def q842: Q = Q(
    "q842_hannah_kay",
    Some(s"""
      |WITH ${sqlBase},
      |sq AS (SELECT sum(CAST(sqrt(CAST(x AS DOUBLE)) AS DECIMAL(18,9)))
      |         AS ssq FROM sv)
      |SELECT CAST(gl.ns AS BIGINT) AS n_suppliers,
      |       CAST(floor(1000.0 * CAST(sq.ssq AS DOUBLE)
      |            * CAST(sq.ssq AS DOUBLE) / CAST(gl.t AS DOUBLE))
      |            AS BIGINT) AS hk_half_milli,
      |       CAST((1000 * gl.t * gl.t) // gl.q2 AS BIGINT)
      |         AS hk_two_milli,
      |       CAST(floor(1000.0 * CAST(gl.t AS DOUBLE)
      |            * sqrt(CAST(gl.t AS DOUBLE))
      |            / sqrt(CAST(gl.q3 AS DOUBLE))) AS BIGINT)
      |         AS hk_three_milli
      |FROM gl CROSS JOIN sq
      |""".stripMargin)) { (s, dir) =>
    val sv = svBase(s, dir).materialize()
    val sq = sv.agg(
      sum(expr("CAST(sqrt(CAST(x AS DOUBLE)) AS DECIMAL(18,9))"))
        .as("ssq"))
    glBase(sv).crossJoin(broadcast(sq))
      .select(col("ns").cast("long").as("n_suppliers"),
        expr("""CAST(floor(1000.0 * CAST(ssq AS DOUBLE)
          |  * CAST(ssq AS DOUBLE) / CAST(t AS DOUBLE)) AS BIGINT)"""
          .stripMargin).as("hk_half_milli"),
        expr("CAST((1000 * t * t - (1000 * t * t) % q2) / q2" +
          " AS DECIMAL(38,0))").cast("long").as("hk_two_milli"),
        expr("""CAST(floor(1000.0 * CAST(t AS DOUBLE)
          |  * sqrt(CAST(t AS DOUBLE)) / sqrt(CAST(q3 AS DOUBLE)))
          |  AS BIGINT)""".stripMargin).as("hk_three_milli"))
  }

  /** Concentration ratios CR4/CR8/CR20 and the single-largest share,
    * via max(cum | rank ≤ k) so small corpora degrade gracefully. */
  def q843: Q = Q(
    "q843_concentration_ratios",
    Some(s"""
      |WITH ${sqlBase},
      |cr AS (SELECT max(CASE WHEN i = 1 THEN cum END) AS c1,
      |              max(CASE WHEN i <= 4 THEN cum END) AS c4,
      |              max(CASE WHEN i <= 8 THEN cum END) AS c8,
      |              max(CASE WHEN i <= 20 THEN cum END) AS c20
      |       FROM rk)
      |SELECT CAST((1000 * cr.c1) // gl.t AS BIGINT) AS top1_milli,
      |       CAST((1000 * cr.c4) // gl.t AS BIGINT) AS cr4_milli,
      |       CAST((1000 * cr.c8) // gl.t AS BIGINT) AS cr8_milli,
      |       CAST((1000 * cr.c20) // gl.t AS BIGINT) AS cr20_milli
      |FROM cr CROSS JOIN gl
      |""".stripMargin)) { (s, dir) =>
    val sv = svBase(s, dir).materialize()
    val cr = rkBase(sv).agg(
      max(when(col("i") === 1, col("cum"))).as("c1"),
      max(when(col("i") <= 4, col("cum"))).as("c4"),
      max(when(col("i") <= 8, col("cum"))).as("c8"),
      max(when(col("i") <= 20, col("cum"))).as("c20"))
    cr.crossJoin(broadcast(glBase(sv)))
      .select(expr("CAST((1000 * c1) div t AS BIGINT)").as("top1_milli"),
        expr("CAST((1000 * c4) div t AS BIGINT)").as("cr4_milli"),
        expr("CAST((1000 * c8) div t AS BIGINT)").as("cr8_milli"),
        expr("CAST((1000 * c20) div t AS BIGINT)").as("cr20_milli"))
  }

  /** Linda index curve for the top m = 2..5 oligopoly groups: each
    * ratio term is an exact integer rational micro-floor, the per-m
    * mean an integer mean. */
  def q844: Q = Q(
    "q844_linda_index",
    Some(s"""
      |WITH ${sqlBase},
      |tp AS (SELECT max(CASE WHEN i = 1 THEN cum END) AS c1,
      |              max(CASE WHEN i = 2 THEN cum END) AS c2,
      |              max(CASE WHEN i = 3 THEN cum END) AS c3,
      |              max(CASE WHEN i = 4 THEN cum END) AS c4,
      |              max(CASE WHEN i = 5 THEN cum END) AS c5
      |       FROM rk WHERE i <= 5),
      |ld AS (
      |  SELECT 2 AS m, (1000000 * c1 * 1) // (1 * (c2 - c1)) AS st
      |  FROM tp
      |  UNION ALL
      |  SELECT 3, (1000000 * c1 * 2) // (1 * (c3 - c1))
      |            + (1000000 * c2 * 1) // (2 * (c3 - c2)) FROM tp
      |  UNION ALL
      |  SELECT 4, (1000000 * c1 * 3) // (1 * (c4 - c1))
      |            + (1000000 * c2 * 2) // (2 * (c4 - c2))
      |            + (1000000 * c3 * 1) // (3 * (c4 - c3)) FROM tp
      |  UNION ALL
      |  SELECT 5, (1000000 * c1 * 4) // (1 * (c5 - c1))
      |            + (1000000 * c2 * 3) // (2 * (c5 - c2))
      |            + (1000000 * c3 * 2) // (3 * (c5 - c3))
      |            + (1000000 * c4 * 1) // (4 * (c5 - c4)) FROM tp)
      |SELECT CAST(m AS BIGINT) AS m,
      |       CAST(st // (m * (m - 1)) AS BIGINT) AS linda_micro
      |FROM ld ORDER BY m
      |""".stripMargin)) { (s, dir) =>
    val tp = rkBase(svBase(s, dir)).where(col("i") <= 5)
      .agg(max(when(col("i") === 1, col("cum"))).as("c1"),
        max(when(col("i") === 2, col("cum"))).as("c2"),
        max(when(col("i") === 3, col("cum"))).as("c3"),
        max(when(col("i") === 4, col("cum"))).as("c4"),
        max(when(col("i") === 5, col("cum"))).as("c5"))
    def t(ci: String, cm: String, i: Int, mi: Int): String =
      s"(1000000 * $ci * $mi) div ($i * ($cm - $ci))"
    tp.select(expr(s"""stack(4,
        |  2, ${t("c1", "c2", 1, 1)},
        |  3, ${t("c1", "c3", 1, 2)} + ${t("c2", "c3", 2, 1)},
        |  4, ${t("c1", "c4", 1, 3)} + ${t("c2", "c4", 2, 2)}
        |     + ${t("c3", "c4", 3, 1)},
        |  5, ${t("c1", "c5", 1, 4)} + ${t("c2", "c5", 2, 3)}
        |     + ${t("c3", "c5", 3, 2)} + ${t("c4", "c5", 4, 1)})
        |  AS (m, st)""".stripMargin))
      .select(col("m").cast("long").as("m"),
        expr("CAST(st div (m * (m - 1)) AS BIGINT)").as("linda_micro"))
      .orderBy(col("m"))
  }

  /** Theil-entropy concentration: H = ln T − Σx·ln x/T, its
    * numbers-equivalent exp(H), and the relative entropy H/ln n. */
  def q845: Q = Q(
    "q845_entropy_concentration",
    Some(s"""
      |WITH ${sqlBase},
      |et AS (SELECT sum(CAST(CAST(x AS DOUBLE)
      |              * ln(CAST(x AS DOUBLE)) AS DECIMAL(28,6)))
      |         AS xlx FROM sv)
      |SELECT CAST(floor(1000.0 * (ln(CAST(gl.t AS DOUBLE))
      |            - CAST(et.xlx AS DOUBLE) / CAST(gl.t AS DOUBLE)))
      |            AS BIGINT) AS entropy_milli,
      |       CAST(floor(1000.0 * exp(ln(CAST(gl.t AS DOUBLE))
      |            - CAST(et.xlx AS DOUBLE) / CAST(gl.t AS DOUBLE)))
      |            AS BIGINT) AS numbers_equiv_milli,
      |       CAST(floor(1000.0 * (ln(CAST(gl.t AS DOUBLE))
      |            - CAST(et.xlx AS DOUBLE) / CAST(gl.t AS DOUBLE))
      |            / ln(CAST(gl.ns AS DOUBLE))) AS BIGINT)
      |         AS relative_milli
      |FROM gl CROSS JOIN et
      |""".stripMargin)) { (s, dir) =>
    val sv = svBase(s, dir).materialize()
    // per-row pinned double x·ln x quantized to DECIMAL(28,6) BEFORE
    // the exact decimal sum — a decimal×decimal product here would hit
    // Spark's precision-loss scale reduction (57→38 digits) and
    // diverge from DuckDB's wide multiply
    val et = sv.agg(sum(expr(
      "CAST(CAST(x AS DOUBLE) * ln(CAST(x AS DOUBLE)) AS DECIMAL(28,6))"))
      .as("xlx"))
    glBase(sv).crossJoin(broadcast(et))
      .select(
        expr("""CAST(floor(1000.0 * (ln(CAST(t AS DOUBLE))
          |  - CAST(xlx AS DOUBLE) / CAST(t AS DOUBLE))) AS BIGINT)"""
          .stripMargin).as("entropy_milli"),
        expr("""CAST(floor(1000.0 * exp(ln(CAST(t AS DOUBLE))
          |  - CAST(xlx AS DOUBLE) / CAST(t AS DOUBLE))) AS BIGINT)"""
          .stripMargin).as("numbers_equiv_milli"),
        expr("""CAST(floor(1000.0 * (ln(CAST(t AS DOUBLE))
          |  - CAST(xlx AS DOUBLE) / CAST(t AS DOUBLE))
          |  / ln(CAST(ns AS DOUBLE))) AS BIGINT)""".stripMargin)
          .as("relative_milli"))
  }
}
