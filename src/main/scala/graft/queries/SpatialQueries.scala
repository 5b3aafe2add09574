package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Materialize.MatOps
import graft.Tables

/** Round-9 spatial-statistics completion wave, extending the shipped
  * Moran's I / Geary's C pair (q592/q593) with the rest of the lattice
  * battery on per-nation ORDER revenue under binary same-region
  * contiguity: Getis-Ord global G (hot-spot concentration), the BB/WW/
  * BW join-count statistics on an above-median mark, Anselin's local
  * Moran LISA decomposition with cluster quadrants, the spatial-lag
  * Pearson correlation, and the local Getis-Ord G* share profile.
  *
  * Scale: one fact pass (orders⋈customer on custkey, nation broadcast)
  * reduces to the 25-row nation dim; ALL spatial sums collapse over
  * per-region aggregates (Σ_r S_r²−Q_r forms), so there is never an
  * n×n weight matrix — the same at-scale identity q592 documents. The
  * above-median mark uses the exact order statistic of the 25-value
  * dim (deterministic tie handling by (x, nationkey)). */
object SpatialQueries {

  val all: Seq[Q] = Seq(q796, q797, q798, q799, q800)

  private def sqlNy: String = """
    |ny AS (
    |  SELECT n.n_nationkey AS nk, any_value(n.n_regionkey) AS rk,
    |         sum(CAST(o.o_totalprice * 100 AS BIGINT)) AS x
    |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    |       JOIN nation n ON n.n_nationkey = c.c_nationkey
    |  GROUP BY 1),
    |gl AS (SELECT count(*) AS n, sum(CAST(x AS HUGEINT)) AS t,
    |              sum(CAST(x AS HUGEINT) * x) AS q FROM ny),
    |reg AS (SELECT rk, count(*) AS nr, sum(CAST(x AS HUGEINT)) AS sr,
    |               sum(CAST(x AS HUGEINT) * x) AS qr
    |        FROM ny GROUP BY 1)""".stripMargin

  private def nyBase(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_custkey"),
        expr("CAST(CAST(o_totalprice * 100 AS DECIMAL(38,0)) AS LONG)")
          .as("v"))
      .join(Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey")),
        col("c_custkey") === col("o_custkey"))
      .join(broadcast(Tables.nation(s, dir)
        .select(col("n_nationkey"), col("n_regionkey"))),
        col("n_nationkey") === col("c_nationkey"))
      .groupBy(col("n_nationkey").as("nk"), col("n_regionkey").as("rk"))
      .agg(sum(col("v").cast("decimal(38,0)")).as("x"))

  private def glBase(ny: DataFrame): DataFrame =
    ny.agg(count(lit(1)).as("n"), sum(col("x")).as("t"),
      sum(col("x") * col("x")).as("q"))

  private def regBase(ny: DataFrame): DataFrame =
    ny.groupBy(col("rk"))
      .agg(count(lit(1)).as("nr"), sum(col("x")).as("sr"),
        sum(col("x") * col("x")).as("qr"))

  /** Getis-Ord global G: same-region cross-product share of the total
    * cross-product, vs its free-sampling expectation W/(n(n−1)). */
  def q796: Q = Q(
    "q796_getis_ord_global_g",
    Some(s"""
      |WITH ${sqlNy},
      |nm AS (SELECT sum(sr * sr - qr) AS num,
      |              sum(nr * (nr - 1)) AS w FROM reg)
      |SELECT CAST(gl.n AS BIGINT) AS n_nations,
      |       CAST((1000000 * nm.num) // (gl.t * gl.t - gl.q) AS BIGINT)
      |         AS getis_g_micro,
      |       CAST((1000000 * nm.w) // (gl.n * (gl.n - 1)) AS BIGINT)
      |         AS expected_g_micro
      |FROM gl CROSS JOIN nm
      |""".stripMargin)) { (s, dir) =>
    val ny = nyBase(s, dir).materialize()
    val nm = regBase(ny).agg(
      sum(col("sr") * col("sr") - col("qr")).as("num"),
      sum(col("nr") * (col("nr") - 1)).as("w"))
    glBase(ny).crossJoin(broadcast(nm))
      .select(col("n").cast("long").as("n_nations"),
        expr("CAST((1000000 * num - (1000000 * num) % (t * t - q))" +
          " / (t * t - q) AS DECIMAL(38,0))").cast("long")
          .as("getis_g_micro"),
        expr("CAST((1000000 * w) div (n * (n - 1)) AS BIGINT)")
          .as("expected_g_micro"))
  }

  /** Join-count statistics: nations marked black when revenue exceeds
    * the exact 25-value median order statistic; BB/WW/BW counts over
    * same-region pairs plus the free-sampling BB expectation. */
  def q797: Q = Q(
    "q797_join_count_stats",
    Some(s"""
      |WITH ${sqlNy},
      |rk2 AS (SELECT nk, rk, x,
      |               row_number() OVER (ORDER BY x, nk) AS rn FROM ny),
      |med AS (SELECT max(CASE WHEN rn = (SELECT (n + 1) // 2 FROM gl)
      |                        THEN x END) AS m FROM rk2),
      |mk AS (SELECT rk, CASE WHEN x > med.m THEN 1 ELSE 0 END AS b
      |       FROM ny CROSS JOIN med),
      |rc AS (SELECT rk, sum(b) AS br, count(*) - sum(b) AS wr
      |       FROM mk GROUP BY 1),
      |jc AS (SELECT sum(br * (br - 1) // 2) AS bb,
      |              sum(wr * (wr - 1) // 2) AS ww,
      |              sum(br * wr) AS bw FROM rc),
      |tb AS (SELECT sum(b) AS btot, count(*) AS n FROM mk),
      |wt AS (SELECT sum(nr * (nr - 1)) // 2 AS w FROM reg)
      |SELECT CAST(jc.bb AS BIGINT) AS bb_joins,
      |       CAST(jc.ww AS BIGINT) AS ww_joins,
      |       CAST(jc.bw AS BIGINT) AS bw_joins,
      |       CAST((1000 * wt.w * tb.btot * (tb.btot - 1))
      |            // (tb.n * (tb.n - 1)) AS BIGINT) AS exp_bb_milli
      |FROM jc CROSS JOIN tb CROSS JOIN wt
      |""".stripMargin)) { (s, dir) =>
    val ny = nyBase(s, dir).materialize()
    val gl = glBase(ny)
    val rk2 = ny.crossJoin(broadcast(gl))
      .select(col("rk"), col("x"), col("n"),
        row_number().over(Window.orderBy(col("x"), col("nk"))).as("rn"))
    val med = rk2
      .agg(max(when(col("rn") === expr("(n + 1) div 2"), col("x"))).as("m"))
    val mk = ny.crossJoin(broadcast(med))
      .select(col("rk"), when(col("x") > col("m"), 1).otherwise(0).as("b"))
      .materialize()
    val rc = mk.groupBy(col("rk"))
      .agg(sum(col("b")).as("br"), (count(lit(1)) - sum(col("b"))).as("wr"))
    val jc = rc.agg(
      sum(expr("br * (br - 1) div 2")).as("bb"),
      sum(expr("wr * (wr - 1) div 2")).as("ww"),
      sum(col("br") * col("wr")).as("bw"))
    val tb = mk.agg(sum(col("b")).as("btot"), count(lit(1)).as("n"))
    val wt = regBase(ny).agg(expr("sum(nr * (nr - 1)) div 2").as("w"))
    jc.crossJoin(broadcast(tb)).crossJoin(broadcast(wt))
      .select(col("bb").cast("long").as("bb_joins"),
        col("ww").cast("long").as("ww_joins"),
        col("bw").cast("long").as("bw_joins"),
        expr("CAST((1000 * w * btot * (btot - 1)) div (n * (n - 1))" +
          " AS BIGINT)").as("exp_bb_milli"))
  }

  /** Anselin local Moran (LISA): per nation the integer-centered
    * cross-product with its same-region neighbors under row-
    * standardized weights, with the HH/LL/HL/LH cluster quadrant. */
  def q798: Q = Q(
    "q798_local_moran_lisa",
    Some(s"""
      |WITH ${sqlNy},
      |cz AS (
      |  SELECT ny.nk, ny.rk, gl.n * CAST(ny.x AS HUGEINT) - gl.t AS c
      |  FROM ny CROSS JOIN gl),
      |rs AS (SELECT rk, sum(c) AS src, count(*) AS nr FROM cz GROUP BY 1),
      |m2 AS (SELECT sum(c * c) AS den FROM cz)
      |SELECT CAST(cz.nk AS BIGINT) AS nation,
      |       CASE WHEN cz.c > 0 AND rs.src - cz.c > 0 THEN 'HH'
      |            WHEN cz.c <= 0 AND rs.src - cz.c <= 0 THEN 'LL'
      |            WHEN cz.c > 0 THEN 'HL' ELSE 'LH' END AS quadrant,
      |       CAST(floor(1000.0 * gl.n * CAST(cz.c AS DOUBLE)
      |            * (CAST(rs.src - cz.c AS DOUBLE) / (rs.nr - 1))
      |            / CAST(m2.den AS DOUBLE)) AS BIGINT) AS local_i_milli
      |FROM cz JOIN rs ON rs.rk = cz.rk
      |CROSS JOIN gl CROSS JOIN m2
      |ORDER BY nation
      |""".stripMargin)) { (s, dir) =>
    val ny = nyBase(s, dir).materialize()
    val gl = glBase(ny)
    val cz = ny.crossJoin(broadcast(gl))
      .select(col("nk"), col("rk"), col("n"),
        (col("n") * col("x") - col("t")).as("c"))
      .materialize()
    val rs = cz.groupBy(col("rk"))
      .agg(sum(col("c")).as("src"), count(lit(1)).as("nr"))
    val m2 = cz.agg(sum(col("c") * col("c")).as("den"))
    cz.join(broadcast(rs), Seq("rk")).crossJoin(broadcast(m2))
      .select(col("nk").cast("long").as("nation"),
        expr("""CASE WHEN c > 0 AND src - c > 0 THEN 'HH'
          |     WHEN c <= 0 AND src - c <= 0 THEN 'LL'
          |     WHEN c > 0 THEN 'HL' ELSE 'LH' END""".stripMargin)
          .as("quadrant"),
        expr("""CAST(floor(1000.0 * n * CAST(c AS DOUBLE)
          |  * (CAST(src - c AS DOUBLE) / (nr - 1))
          |  / CAST(den AS DOUBLE)) AS BIGINT)""".stripMargin)
          .as("local_i_milli"))
      .orderBy(col("nation"))
  }

  /** Pearson correlation between each nation's revenue and its
    * same-region neighbor-mean (floored to integer cents) — the
    * scatter-plot slope companion to Moran's I. */
  def q799: Q = Q(
    "q799_spatial_lag_corr",
    Some(s"""
      |WITH ${sqlNy},
      |lg AS (
      |  SELECT ny.nk, CAST(ny.x AS HUGEINT) AS x,
      |         (reg.sr - ny.x) // (reg.nr - 1) AS y
      |  FROM ny JOIN reg ON reg.rk = ny.rk),
      |mo AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
      |              sum(x * y) AS sxy, sum(x * x) AS sxx,
      |              sum(y * y) AS syy FROM lg)
      |SELECT CAST(n AS BIGINT) AS n_nations,
      |       CAST(floor(1000.0 * CAST(n * sxy - sx * sy AS DOUBLE)
      |            / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
      |               * sqrt(CAST(n * syy - sy * sy AS DOUBLE))))
      |         AS BIGINT) AS lag_corr_milli
      |FROM mo
      |""".stripMargin)) { (s, dir) =>
    val ny = nyBase(s, dir).materialize()
    val lg = ny.join(broadcast(regBase(ny)), Seq("rk"))
      .select(col("x"),
        expr("CAST((sr - x - (sr - x) % (nr - 1)) / (nr - 1)" +
          " AS DECIMAL(38,0))").as("y"))
    lg.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("n").cast("long").as("n_nations"),
        expr("""CAST(floor(1000.0 * CAST(n * sxy - sx * sy AS DOUBLE)
          |  / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
          |     * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))) AS BIGINT)"""
          .stripMargin).as("lag_corr_milli"))
  }

  /** Local Getis-Ord G* profile: each nation's own revenue share and
    * its region-block (self-inclusive) G* share of the global total. */
  def q800: Q = Q(
    "q800_local_gstar_profile",
    Some(s"""
      |WITH ${sqlNy}
      |SELECT CAST(ny.nk AS BIGINT) AS nation,
      |       CAST(ny.rk AS BIGINT) AS region,
      |       CAST((1000000 * CAST(ny.x AS HUGEINT)) // gl.t AS BIGINT)
      |         AS share_micro,
      |       CAST((1000000 * reg.sr) // gl.t AS BIGINT) AS gstar_micro
      |FROM ny JOIN reg ON reg.rk = ny.rk CROSS JOIN gl
      |ORDER BY nation
      |""".stripMargin)) { (s, dir) =>
    val ny = nyBase(s, dir).materialize()
    ny.join(broadcast(regBase(ny)), Seq("rk"))
      .crossJoin(broadcast(glBase(ny)))
      .select(col("nk").cast("long").as("nation"),
        col("rk").cast("long").as("region"),
        expr("CAST((1000000 * x) div t AS DECIMAL(38,0))").cast("long")
          .as("share_micro"),
        expr("CAST((1000000 * sr) div t AS DECIMAL(38,0))").cast("long")
          .as("gstar_micro"))
      .orderBy(col("nation"))
  }
}
