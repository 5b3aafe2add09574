package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables
import graft.dedup.SortedNeighborhood

/** Round-9 copula wave on the (order value, order size) pair: the
  * empirical copula on the decile grid, upper/lower tail-dependence
  * estimates, the grid Schweizer-Wolff σ, the grid Spearman ρ
  * (12∫∫C − 3 on the 9×9 lattice), and the diagonal quadrant-
  * dependence profile C(t,t) vs t².
  *
  * Scale: marginal deciles come from exact value-histogram order
  * statistics — the distinct-value count table rides the bucket-
  * parallel [[SortedNeighborhood.globalRankCum]] spine (never a
  * fact-scaled row_number). Each order is then bucketed by a ≤9-row
  * broadcast threshold join; everything downstream is the ≤100-cell
  * 2D histogram dim. Ties follow the ECDF convention (q_p = smallest
  * value with 1000·cum ≥ p·n) identically in both engines; all grid
  * statistics are exact integer ratios with one pinned double each. */
object CopulaQueries {

  val all: Seq[Q] = Seq(q816, q817, q818, q819, q820)

  private def sqlBase: String = """
    |ord AS (
    |  SELECT o.o_orderkey AS k,
    |         CAST(o.o_totalprice * 100 AS BIGINT) AS x,
    |         count(*) AS y
    |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    |  GROUP BY 1, 2),
    |gl AS (SELECT count(*) AS n FROM ord),
    |pp AS (SELECT * FROM (VALUES (50),(100),(200),(300),(400),(500),
    |       (600),(700),(800),(900),(950)) AS v(p)),
    |xcum AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM
    |  (SELECT x AS v, count(*) AS c FROM ord GROUP BY 1)),
    |qx AS (SELECT pp.p, min(v) AS q FROM pp CROSS JOIN gl
    |       JOIN xcum ON 1000 * xcum.cum >= pp.p * gl.n GROUP BY 1),
    |ycum AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM
    |  (SELECT y AS v, count(*) AS c FROM ord GROUP BY 1)),
    |qy AS (SELECT pp.p, min(v) AS q FROM pp CROSS JOIN gl
    |       JOIN ycum ON 1000 * ycum.cum >= pp.p * gl.n GROUP BY 1),
    |dec AS (SELECT * FROM (VALUES (100),(200),(300),(400),(500),(600),
    |        (700),(800),(900)) AS v(p)),
    |bu AS (SELECT o.k, count(t.q) AS bu FROM ord o
    |       LEFT JOIN (SELECT qx.q FROM qx JOIN dec ON dec.p = qx.p) t
    |         ON o.x > t.q GROUP BY 1),
    |bv AS (SELECT o.k, count(t.q) AS bv FROM ord o
    |       LEFT JOIN (SELECT qy.q FROM qy JOIN dec ON dec.p = qy.p) t
    |         ON o.y > t.q GROUP BY 1),
    |hist AS (SELECT bu.bu, bv.bv, count(*) AS cnt
    |         FROM bu JOIN bv ON bv.k = bu.k GROUP BY 1, 2),
    |grid AS (SELECT i.i, j.j
    |         FROM (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9)) i(i)
    |         CROSS JOIN (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9)) j(j)),
    |cc AS (SELECT g.i, g.j, coalesce(sum(h.cnt), 0) AS cnt
    |       FROM grid g LEFT JOIN hist h ON h.bu < g.i AND h.bv < g.j
    |       GROUP BY 1, 2)""".stripMargin

  /** All five queries of this wave previously rebuilt the same (order
    * value, order size) frame, the same marginal-quantile dims and the
    * same ≤100-cell 2D histogram independently (4× histBase + q817's
    * private rebuild ≈ 15.8 s of the sf0.1 bench). They are sub-corpus
    * reductions — exactly the SpineCache shape — so each is built ONCE
    * per process/pass and read by every consumer; longs round-trip
    * parquet exactly, results unchanged (oracle re-proven). */
  private val spineSrc = Seq("orders", "lineitem")

  private def ordSpine(s: SparkSession, dir: String): DataFrame =
    graft.sources.SpineCache.table(s, dir, "copula_ord", spineSrc)(
      ordBase(s, dir))

  /** Spark order pair frame (k, x cents, y items). */
  private def ordBase(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"),
        expr("CAST(CAST(o_totalprice * 100 AS DECIMAL(38,0)) AS LONG)")
          .as("x"))
      .join(Tables.lineitem(s, dir).select(col("l_orderkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey").as("k"), col("x"))
      .agg(count(lit(1)).as("y"))

  /** Exact marginal quantile dim (p ‰, q value) via the bucket-
    * parallel value-histogram cum spine. */
  private def quantiles(
      vals: DataFrame, bucket: org.apache.spark.sql.Column,
      gl: DataFrame, ps: Seq[Int]): DataFrame = {
    val vc = vals.groupBy(col("v")).agg(count(lit(1)).as("c"))
      .withColumn("vb", bucket)
    val cum = SortedNeighborhood.globalRankCum(vc, "v", "vb", Seq.empty,
      cumCol = Some("c"))
    val pp = vals.sparkSession.createDataFrame(
      ps.map(Tuple1(_))).toDF("p")
    broadcast(pp).crossJoin(broadcast(gl))
      .join(cum, col("__cum") * 1000 >= col("p") * col("n"))
      .groupBy(col("p")).agg(min(col("v")).as("q"))
  }

  private val deciles = Seq(100, 200, 300, 400, 500, 600, 700, 800, 900)
  private val allPs = Seq(50, 100, 200, 300, 400, 500, 600, 700, 800,
    900, 950)

  /** (hist dim, gl) shared build: per-order decile buckets via ≤9-row
    * broadcast threshold joins, then the ≤100-cell 2D histogram. */
  private def quantSpines(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    def qs(name: String, f: => DataFrame) =
      graft.sources.SpineCache.table(s, dir, name, spineSrc)(f)
    lazy val ord = ordSpine(s, dir)
    lazy val gl = ord.agg(count(lit(1)).as("n"))
    (qs("copula_qx", quantiles(ord.select(col("x").as("v")),
        expr("v div 1000000"), gl, allPs)),
      qs("copula_qy", quantiles(ord.select(col("y").as("v")), col("v"),
        gl, allPs)))
  }

  private def histBase(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val ord = ordSpine(s, dir)
    val gl = ord.agg(count(lit(1)).as("n")).materialize()
    val (qx, qy) = quantSpines(s, dir)
    val hist = graft.sources.SpineCache.table(s, dir, "copula_hist",
        spineSrc) {
      val qx9 = qx.where(col("p").isin(deciles: _*)).select(col("q"))
      val qy9 = qy.where(col("p").isin(deciles: _*)).select(col("q"))
      val bu = ord.join(broadcast(qx9), col("x") > col("q"), "left")
        .groupBy(col("k")).agg(count(col("q")).as("bu"))
      val bv = ord.select(col("k").as("k2"), col("y"))
        .join(broadcast(qy9), col("y") > col("q"), "left")
        .groupBy(col("k2")).agg(count(col("q")).as("bv"))
      bu.join(bv, col("k") === col("k2"))
        .groupBy(col("bu"), col("bv")).agg(count(lit(1)).as("cnt"))
    }
    (hist, gl, qx, qy)
  }

  private def gridDf(s: SparkSession): DataFrame = {
    val ij = (1 to 9).map(Tuple1(_))
    val i = s.createDataFrame(ij).toDF("i")
    val j = s.createDataFrame(ij).toDF("j")
    i.crossJoin(j)
  }

  /** Cumulative copula counts on the 9×9 grid (i, j, cnt). */
  private def ccBase(s: SparkSession, hist: DataFrame): DataFrame =
    gridDf(s)
      .join(hist, col("bu") < col("i") && col("bv") < col("j"), "left")
      .groupBy(col("i"), col("j"))
      .agg(coalesce(sum(col("cnt")), lit(0L)).as("cnt"))

  /** Empirical copula on the decile grid: C(i/10, j/10) in micro. */
  def q816: Q = Q(
    "q816_empirical_copula_grid",
    Some(s"""
      |WITH ${sqlBase}
      |SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
      |       CAST((1000000 * cnt) // gl.n AS BIGINT) AS c_micro
      |FROM cc CROSS JOIN gl ORDER BY i, j
      |""".stripMargin)) { (s, dir) =>
    val (hist, gl, _, _) = histBase(s, dir)
    ccBase(s, hist).crossJoin(broadcast(gl))
      .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
        expr("CAST((1000000 * cnt) div n AS BIGINT)").as("c_micro"))
      .orderBy(col("i"), col("j"))
  }

  /** Tail dependence: λ_L at the 5%/10% corners and λ_U at the
    * 90%/95% corners — conditional joint-tail shares. */
  def q817: Q = Q(
    "q817_tail_dependence",
    Some(s"""
      |WITH ${sqlBase},
      |jt AS (
      |  SELECT o.k, o.x, o.y, x9.q AS qx90, x5.q AS qx95,
      |         xl1.q AS qx10, xl0.q AS qx05, y9.q AS qy90,
      |         y5.q AS qy95, yl1.q AS qy10, yl0.q AS qy05
      |  FROM ord o
      |  CROSS JOIN (SELECT q FROM qx WHERE p = 900) x9
      |  CROSS JOIN (SELECT q FROM qx WHERE p = 950) x5
      |  CROSS JOIN (SELECT q FROM qx WHERE p = 100) xl1
      |  CROSS JOIN (SELECT q FROM qx WHERE p = 50) xl0
      |  CROSS JOIN (SELECT q FROM qy WHERE p = 900) y9
      |  CROSS JOIN (SELECT q FROM qy WHERE p = 950) y5
      |  CROSS JOIN (SELECT q FROM qy WHERE p = 100) yl1
      |  CROSS JOIN (SELECT q FROM qy WHERE p = 50) yl0),
      |tl AS (
      |  SELECT 'L05' AS tail,
      |         sum(CASE WHEN x <= qx05 THEN 1 ELSE 0 END) AS nc,
      |         sum(CASE WHEN x <= qx05 AND y <= qy05 THEN 1 ELSE 0 END)
      |           AS nj FROM jt
      |  UNION ALL
      |  SELECT 'L10',
      |         sum(CASE WHEN x <= qx10 THEN 1 ELSE 0 END),
      |         sum(CASE WHEN x <= qx10 AND y <= qy10 THEN 1 ELSE 0 END)
      |  FROM jt
      |  UNION ALL
      |  SELECT 'U90',
      |         sum(CASE WHEN x > qx90 THEN 1 ELSE 0 END),
      |         sum(CASE WHEN x > qx90 AND y > qy90 THEN 1 ELSE 0 END)
      |  FROM jt
      |  UNION ALL
      |  SELECT 'U95',
      |         sum(CASE WHEN x > qx95 THEN 1 ELSE 0 END),
      |         sum(CASE WHEN x > qx95 AND y > qy95 THEN 1 ELSE 0 END)
      |  FROM jt)
      |SELECT tail, CAST(nc AS BIGINT) AS n_cond,
      |       CAST((1000 * nj) // nc AS BIGINT) AS lambda_milli
      |FROM tl ORDER BY tail
      |""".stripMargin)) { (s, dir) =>
    // the 4 tail thresholds are per-p independent order statistics, so
    // reading them out of the shared 11-p quantile spine is value-
    // identical to the private 4-p build this used to do
    val ord = ordSpine(s, dir)
    val (qx, qy) = quantSpines(s, dir)
    def thr(qdf: DataFrame, p: Int, nm: String): DataFrame =
      qdf.where(col("p") === p).select(col("q").as(nm))
    val jt = ord
      .crossJoin(broadcast(thr(qx, 50, "qx05")))
      .crossJoin(broadcast(thr(qx, 100, "qx10")))
      .crossJoin(broadcast(thr(qx, 900, "qx90")))
      .crossJoin(broadcast(thr(qx, 950, "qx95")))
      .crossJoin(broadcast(thr(qy, 50, "qy05")))
      .crossJoin(broadcast(thr(qy, 100, "qy10")))
      .crossJoin(broadcast(thr(qy, 900, "qy90")))
      .crossJoin(broadcast(thr(qy, 950, "qy95")))
      .materialize()
    def row(tail: String, cond: org.apache.spark.sql.Column,
        joint: org.apache.spark.sql.Column): DataFrame =
      jt.agg(sum(when(cond, 1).otherwise(0)).as("nc"),
        sum(when(joint, 1).otherwise(0)).as("nj"))
        .select(lit(tail).as("tail"), col("nc"), col("nj"))
    val tl = row("L05", col("x") <= col("qx05"),
        col("x") <= col("qx05") && col("y") <= col("qy05"))
      .unionAll(row("L10", col("x") <= col("qx10"),
        col("x") <= col("qx10") && col("y") <= col("qy10")))
      .unionAll(row("U90", col("x") > col("qx90"),
        col("x") > col("qx90") && col("y") > col("qy90")))
      .unionAll(row("U95", col("x") > col("qx95"),
        col("x") > col("qx95") && col("y") > col("qy95")))
    tl.select(col("tail"), col("nc").cast("long").as("n_cond"),
        expr("CAST((1000 * nj) div nc AS BIGINT)").as("lambda_milli"))
      .orderBy(col("tail"))
  }

  /** Schweizer-Wolff σ on the decile grid: 12·mean|C − uv|, milli. */
  def q818: Q = Q(
    "q818_schweizer_wolff",
    Some(s"""
      |WITH ${sqlBase}
      |SELECT CAST(count(*) AS BIGINT) AS n_cells,
      |       CAST(floor(12000.0
      |         * sum(abs(100 * cnt - CAST(i * j * gl.n AS HUGEINT)))
      |         / (81.0 * 100.0 * gl.n)) AS BIGINT) AS sw_sigma_milli
      |FROM cc CROSS JOIN gl GROUP BY gl.n
      |""".stripMargin)) { (s, dir) =>
    val (hist, gl, _, _) = histBase(s, dir)
    ccBase(s, hist).crossJoin(broadcast(gl))
      .groupBy(col("n"))
      .agg(count(lit(1)).as("nc"),
        sum(abs(col("cnt") * 100
          - (col("i") * col("j")).cast("decimal(38,0)") * col("n")))
          .as("sd"))
      .select(col("nc").cast("long").as("n_cells"),
        expr("""CAST(floor(12000.0 * CAST(sd AS DOUBLE)
          |  / (81.0 * 100.0 * n)) AS BIGINT)""".stripMargin)
          .as("sw_sigma_milli"))
  }

  /** Grid Spearman ρ: 12·ΣC/(81·n) − 3 on the decile lattice. */
  def q819: Q = Q(
    "q819_grid_spearman",
    Some(s"""
      |WITH ${sqlBase}
      |SELECT CAST(sum(cnt) AS BIGINT) AS cum_count,
      |       CAST(floor(1000.0 * (12.0 * sum(cnt) / (81.0 * gl.n) - 3.0))
      |            AS BIGINT) AS rho_grid_milli
      |FROM cc CROSS JOIN gl GROUP BY gl.n
      |""".stripMargin)) { (s, dir) =>
    val (hist, gl, _, _) = histBase(s, dir)
    ccBase(s, hist).crossJoin(broadcast(gl))
      .groupBy(col("n"))
      .agg(sum(col("cnt")).as("sc"))
      .select(col("sc").cast("long").as("cum_count"),
        expr("""CAST(floor(1000.0 * (12.0 * CAST(sc AS DOUBLE)
          |  / (81.0 * n) - 3.0)) AS BIGINT)""".stripMargin)
          .as("rho_grid_milli"))
  }

  /** Diagonal quadrant-dependence profile: C(t,t) vs the independence
    * diagonal t² at each decile. */
  def q820: Q = Q(
    "q820_quadrant_profile",
    Some(s"""
      |WITH ${sqlBase}
      |SELECT CAST(i AS BIGINT) AS t_decile,
      |       CAST((1000000 * cnt) // gl.n AS BIGINT) AS c_diag_micro,
      |       CAST(10000 * i * i AS BIGINT) AS indep_micro,
      |       CAST((1000000 * cnt) // gl.n - 10000 * i * i AS BIGINT)
      |         AS gap_micro
      |FROM cc CROSS JOIN gl WHERE i = j ORDER BY t_decile
      |""".stripMargin)) { (s, dir) =>
    val (hist, gl, _, _) = histBase(s, dir)
    ccBase(s, hist).where(col("i") === col("j"))
      .crossJoin(broadcast(gl))
      .select(col("i").cast("long").as("t_decile"),
        expr("CAST((1000000 * cnt) div n AS BIGINT)").as("c_diag_micro"),
        (col("i") * col("i") * 10000).cast("long").as("indep_micro"),
        expr("CAST((1000000 * cnt) div n - 10000 * i * i AS BIGINT)")
          .as("gap_micro"))
      .orderBy(col("t_decile"))
  }
}
