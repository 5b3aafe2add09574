package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables
import graft.dedup.SortedNeighborhood

/** Round-9 poverty & polarization wave on customer account balances
  * (floored at zero as the welfare proxy; the relative poverty line
  * is 60% of the exact ECDF median): the Foster-Greer-Thorbecke
  * ladder FGT0/1/2, the Sen poverty index (headcount × gap × poor-
  * Gini composition), the Watts index, Wolfson's bipolarization, and
  * the Pietra/Hoover maximum-redistribution share.
  *
  * Scale: ranks (full and poor-subset Ginis) ride the bucket-parallel
  * [[SortedNeighborhood.globalRankCum]] spine; gap moments are exact
  * integer aggregates against a 1-row broadcast line; Watts' ln terms
  * use the DECIMAL(18,9) discipline with max(x,1¢) positivity
  * (documented); each index is one pinned double at most. */
object PovertyQueries {

  val all: Seq[Q] = Seq(q881, q882, q883, q884, q885)

  private def sqlBase: String = """
    |x AS (SELECT greatest(CAST(c_acctbal * 100 AS BIGINT), 0) AS v,
    |             c_custkey AS k FROM customer),
    |gl AS (SELECT count(*) AS n, sum(CAST(v AS HUGEINT)) AS s FROM x),
    |vc AS (SELECT v AS val, sum(c) OVER (ORDER BY v) AS cum FROM
    |  (SELECT v, count(*) AS c FROM x GROUP BY 1)),
    |md AS (SELECT min(val) AS m FROM vc CROSS JOIN gl
    |       WHERE 2 * cum >= gl.n),
    |zz AS (SELECT (6 * m) // 10 AS z FROM md)""".stripMargin

  /** Spark (x, gl, z) frames: floored balances, totals, 60%-median
    * poverty line. */
  private def lineBase(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val x = Tables.customer(s, dir)
      .select(greatest(
        expr("CAST(CAST(c_acctbal * 100 AS DECIMAL(38,0)) AS LONG)"),
        lit(0L)).as("v"), col("c_custkey").as("k"))
      .materialize()
    val gl = x.select(col("v").cast("decimal(38,0)").as("vd"))
      .agg(count(lit(1)).as("n"), sum(col("vd")).as("s")).materialize()
    val z = x.groupBy(col("v").as("val")).agg(count(lit(1)).as("c"))
      .select(col("val"), sum(col("c")).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("val")))
        .as("cum"))
      .crossJoin(broadcast(gl))
      .where(col("cum") * 2 >= col("n"))
      .agg(min(col("val")).as("m"))
      .select(expr("(6 * m) div 10").as("z"))
    (x, gl, z)
  }

  /** Rank-formula Gini over a (v, k) frame via the bucket-parallel
    * spine: G = Σ(2i−1)v/(nS) − (n+1)/n, milli-floored. */
  private def giniExpr: String =
    """CAST(floor(1000.0 * (CAST(riv AS DOUBLE)
      |  / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))
      |  - (n + 1.0) / n)) AS BIGINT)""".stripMargin

  private def rivBase(vals: DataFrame): DataFrame = {
    val in = vals.withColumn("vb", expr("v div 1000000"))
    SortedNeighborhood.globalRankCum(in, "k", "vb", Seq("v"))
      .select(col("v").cast("decimal(38,0)").as("vd"),
        col("__rank").cast("decimal(38,0)").as("i"))
      .agg(count(lit(1)).as("n"), sum(col("vd")).as("s"),
        sum((col("i") * 2 - 1) * col("vd")).as("riv"))
  }

  /** FGT poverty ladder at z = 60% of the median: headcount, gap,
    * severity — exact integer rationals. */
  def q881: Q = Q(
    "q881_fgt_poverty_ladder",
    Some(s"""
      |WITH ${sqlBase},
      |pg AS (SELECT count(*) AS np,
      |              sum(CAST(zz.z - x.v AS HUGEINT)) AS g1,
      |              sum(CAST(zz.z - x.v AS HUGEINT) * (zz.z - x.v))
      |                AS g2
      |       FROM x CROSS JOIN zz WHERE x.v < zz.z)
      |SELECT CAST(zz.z AS BIGINT) AS poverty_line_cents,
      |       CAST(pg.np AS BIGINT) AS n_poor,
      |       CAST((1000 * pg.np) // gl.n AS BIGINT) AS fgt0_milli,
      |       CAST((1000000 * pg.g1) // (gl.n * zz.z) AS BIGINT)
      |         AS fgt1_micro,
      |       CAST((1000000 * pg.g2) // (gl.n * zz.z * zz.z) AS BIGINT)
      |         AS fgt2_micro
      |FROM zz CROSS JOIN pg CROSS JOIN gl
      |""".stripMargin)) { (s, dir) =>
    val (x, gl, z) = lineBase(s, dir)
    val pg = x.crossJoin(broadcast(z)).where(col("v") < col("z"))
      .select((col("z") - col("v")).cast("decimal(38,0)").as("g"))
      .agg(count(lit(1)).as("np"), sum(col("g")).as("g1"),
        sum(col("g") * col("g")).as("g2"))
    z.crossJoin(broadcast(pg)).crossJoin(broadcast(gl))
      .select(col("z").cast("long").as("poverty_line_cents"),
        col("np").cast("long").as("n_poor"),
        expr("CAST((1000 * np) div n AS BIGINT)").as("fgt0_milli"),
        expr("CAST((1000000 * g1 - (1000000 * g1) % (n * z)) / (n * z)" +
          " AS DECIMAL(38,0))").cast("long").as("fgt1_micro"),
        expr("CAST((1000000 * g2 - (1000000 * g2) % (n * z * z))" +
          " / (n * z * z) AS DECIMAL(38,0))").cast("long")
          .as("fgt2_micro"))
  }

  /** Sen poverty index S = H·(I + (1−I)·G_poor): headcount ×
    * income-gap ratio × poor-subset Gini composition. */
  def q882: Q = Q(
    "q882_sen_index",
    Some(s"""
      |WITH ${sqlBase},
      |pr AS (SELECT x.v, x.k FROM x CROSS JOIN zz WHERE x.v < zz.z),
      |prk AS (SELECT v, row_number() OVER (ORDER BY v, k) AS i
      |        FROM pr),
      |pm AS (SELECT count(*) AS np, sum(CAST(v AS HUGEINT)) AS sp,
      |              sum(CAST(2 * i - 1 AS HUGEINT) * v) AS riv
      |       FROM prk),
      |tm AS (SELECT
      |  CAST(pm.np AS DOUBLE) / gl.n AS h,
      |  1.0 - CAST(pm.sp AS DOUBLE) / (pm.np * CAST(zz.z AS DOUBLE))
      |    AS ig,
      |  CAST(pm.riv AS DOUBLE) / (CAST(pm.np AS DOUBLE)
      |    * CAST(pm.sp AS DOUBLE)) - (pm.np + 1.0) / pm.np AS gp
      |  FROM pm CROSS JOIN gl CROSS JOIN zz)
      |SELECT CAST(floor(1000.0 * h) AS BIGINT) AS headcount_milli,
      |       CAST(floor(1000.0 * ig) AS BIGINT) AS income_gap_milli,
      |       CAST(floor(1000.0 * gp) AS BIGINT) AS gini_poor_milli,
      |       CAST(floor(1000.0 * h * (ig + (1.0 - ig) * gp)) AS BIGINT)
      |         AS sen_index_milli
      |FROM tm
      |""".stripMargin)) { (s, dir) =>
    val (x, gl, z) = lineBase(s, dir)
    val pm = rivBase(x.crossJoin(broadcast(z)).where(col("v") < col("z"))
      .select(col("v"), col("k")))
      .select(col("n").as("np"), col("s").as("sp"), col("riv"))
    pm.crossJoin(broadcast(gl)).crossJoin(broadcast(z))
      .select(
        expr("CAST(np AS DOUBLE) / n").as("h"),
        expr("1.0 - CAST(sp AS DOUBLE) / (np * CAST(z AS DOUBLE))")
          .as("ig"),
        expr("""CAST(riv AS DOUBLE) / (CAST(np AS DOUBLE)
          |  * CAST(sp AS DOUBLE)) - (np + 1.0) / np""".stripMargin)
          .as("gp"))
      .select(expr("CAST(floor(1000.0 * h) AS BIGINT)")
        .as("headcount_milli"),
        expr("CAST(floor(1000.0 * ig) AS BIGINT)").as("income_gap_milli"),
        expr("CAST(floor(1000.0 * gp) AS BIGINT)").as("gini_poor_milli"),
        expr("CAST(floor(1000.0 * h * (ig + (1.0 - ig) * gp))" +
          " AS BIGINT)").as("sen_index_milli"))
  }

  /** Watts index: mean over ALL of ln(z/x) among the poor, balances
    * floored at 1¢ for positivity (documented). */
  def q883: Q = Q(
    "q883_watts_index",
    Some(s"""
      |WITH ${sqlBase},
      |wt AS (SELECT sum(CAST(ln(CAST(zz.z AS DOUBLE)
      |                          / greatest(x.v, 1))
      |              AS DECIMAL(18,9))) AS sl, count(*) AS np
      |       FROM x CROSS JOIN zz WHERE x.v < zz.z)
      |SELECT CAST(np AS BIGINT) AS n_poor,
      |       CAST(floor(1000.0 * CAST(sl AS DOUBLE) / gl.n) AS BIGINT)
      |         AS watts_milli
      |FROM wt CROSS JOIN gl
      |""".stripMargin)) { (s, dir) =>
    val (x, gl, z) = lineBase(s, dir)
    x.crossJoin(broadcast(z)).where(col("v") < col("z"))
      .select(expr("CAST(ln(CAST(z AS DOUBLE) / greatest(v, 1))" +
        " AS DECIMAL(18,9))").as("l"))
      .agg(sum(col("l")).as("sl"), count(lit(1)).as("np"))
      .crossJoin(broadcast(gl))
      .select(col("np").cast("long").as("n_poor"),
        expr("CAST(floor(1000.0 * CAST(sl AS DOUBLE) / n) AS BIGINT)")
          .as("watts_milli"))
  }

  /** Wolfson bipolarization: 2·(2·(½ − L(½)) − Gini)·μ/median. */
  def q884: Q = Q(
    "q884_wolfson_polarization",
    Some(s"""
      |WITH ${sqlBase},
      |rk AS (SELECT v, row_number() OVER (ORDER BY v, k) AS i FROM x),
      |gn AS (SELECT sum(CAST(2 * i - 1 AS HUGEINT) * v) AS riv FROM rk),
      |lh AS (SELECT sum(CAST(v AS HUGEINT)) AS bh
      |       FROM rk CROSS JOIN gl WHERE 2 * i <= gl.n)
      |SELECT CAST(floor(1000.0 * (CAST(gn.riv AS DOUBLE)
      |            / (CAST(gl.n AS DOUBLE) * CAST(gl.s AS DOUBLE))
      |            - (gl.n + 1.0) / gl.n)) AS BIGINT) AS gini_milli,
      |       CAST((1000 * lh.bh) // gl.s AS BIGINT) AS l_half_milli,
      |       CAST(floor(1000.0 * 2.0
      |            * (2.0 * (0.5 - CAST(lh.bh AS DOUBLE)
      |                      / CAST(gl.s AS DOUBLE))
      |               - (CAST(gn.riv AS DOUBLE)
      |                  / (CAST(gl.n AS DOUBLE) * CAST(gl.s AS DOUBLE))
      |                  - (gl.n + 1.0) / gl.n))
      |            * (CAST(gl.s AS DOUBLE) / gl.n) / md.m) AS BIGINT)
      |         AS wolfson_milli
      |FROM gn CROSS JOIN lh CROSS JOIN gl CROSS JOIN md
      |""".stripMargin)) { (s, dir) =>
    val (x, gl, _) = lineBase(s, dir)
    val in = x.withColumn("vb", expr("v div 1000000"))
    val rk = SortedNeighborhood.globalRankCum(in, "k", "vb", Seq("v"))
      .select(col("v"), col("__rank").as("i")).materialize()
    val gn = rk.select((col("i").cast("decimal(38,0)") * 2 - 1)
      .multiply(col("v")).as("t"))
      .agg(sum(col("t")).as("riv"))
    val lh = rk.crossJoin(broadcast(gl)).where(col("i") * 2 <= col("n"))
      .agg(sum(col("v").cast("decimal(38,0)")).as("bh"))
    val md = x.groupBy(col("v").as("val")).agg(count(lit(1)).as("c"))
      .select(col("val"), sum(col("c")).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("val")))
        .as("cum"))
      .crossJoin(broadcast(gl)).where(col("cum") * 2 >= col("n"))
      .agg(min(col("val")).as("m"))
    gn.crossJoin(broadcast(lh)).crossJoin(broadcast(gl))
      .crossJoin(broadcast(md))
      .select(expr(giniExpr).as("gini_milli"),
        expr("CAST((1000 * bh - (1000 * bh) % s) / s AS DECIMAL(38,0))")
          .cast("long").as("l_half_milli"),
        expr("""CAST(floor(1000.0 * 2.0
          |  * (2.0 * (0.5 - CAST(bh AS DOUBLE) / CAST(s AS DOUBLE))
          |     - (CAST(riv AS DOUBLE)
          |        / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))
          |        - (n + 1.0) / n))
          |  * (CAST(s AS DOUBLE) / n) / m) AS BIGINT)""".stripMargin)
          .as("wolfson_milli"))
  }

  /** Pietra/Hoover index: Σ|n·x − S|/(2nS) — the share that must move
    * to equalize. */
  def q885: Q = Q(
    "q885_pietra_hoover",
    Some(s"""
      |WITH ${sqlBase},
      |ab AS (SELECT sum(abs(gl.n * CAST(x.v AS HUGEINT) - gl.s)) AS sa
      |       FROM x CROSS JOIN gl)
      |SELECT CAST((1000 * ab.sa) // (2 * gl.n * gl.s) AS BIGINT)
      |         AS pietra_milli
      |FROM ab CROSS JOIN gl
      |""".stripMargin)) { (s, dir) =>
    val (x, gl, _) = lineBase(s, dir)
    x.crossJoin(broadcast(gl))
      .select(abs(col("n") * col("v").cast("decimal(38,0)") - col("s"))
        .as("a"))
      .agg(sum(col("a")).as("sa"))
      .crossJoin(broadcast(gl))
      .select(expr("CAST((1000 * sa - (1000 * sa) % (2 * n * s))" +
        " / (2 * n * s) AS DECIMAL(38,0))").cast("long")
        .as("pietra_milli"))
  }
}
