package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables

/** Round-9 ordinal-association wave: Somers' D (both directions),
  * Goodman–Kruskal gamma, Stuart's tau-c, Scott's pi and
  * linear-weighted kappa — the classical ordinal battery the suite's
  * tau-b faces (q478/q654) referenced but didn't ship. One fact pass
  * builds the 5×5 priority × value-band contingency table; every
  * statistic is then EXACT INTEGER algebra on the 25-cell dim
  * (concordant/discordant pair sums via the cells×cells cross join —
  * 625 combinations, never a row pair), micro-quantized with
  * truncating div on both engines. Scales: the only fact-width work
  * is one groupBy; everything downstream is O(1). */
object OrdinalQueries {

  val all: Seq[Q] = Seq(q706, q707, q708, q709, q710)

  /** Oracle CTE `cells(x, y, c)` — x = priority level 1..5, y = order
    * value band 1..5 (100k steps, top band open). */
  private def sqlCells: String = """
    |cells AS (
    |  SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS x,
    |         least(4, CAST(floor(o_totalprice / 100000) AS BIGINT)) + 1
    |           AS y,
    |         count(*) AS c
    |  FROM orders GROUP BY 1, 2)""".stripMargin

  private def cells(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(
        expr("CAST(substr(o_orderpriority, 1, 1) AS BIGINT)").as("x"),
        expr("least(4, CAST(floor(o_totalprice / 100000) AS BIGINT)) + 1")
          .as("y"))
      .agg(count(lit(1)).as("c"))

  /** Oracle CTE block computing the shared pair sums over `cells`:
    * conc/disc (unordered concordant/discordant pair counts), n, and
    * the tie sums sx2 = Σ n_i·(n_i·−1), sy2 = Σ n_·j(n_·j−1),
    * sxy2 = Σ n_ij(n_ij−1) (all DOUBLED tie-pair counts). */
  private def sqlPairs: String = """
    |pr AS (
    |  SELECT sum(CASE WHEN b.x > a.x AND b.y > a.y
    |                  THEN CAST(a.c AS HUGEINT) * b.c ELSE 0 END) AS conc,
    |         sum(CASE WHEN b.x > a.x AND b.y < a.y
    |                  THEN CAST(a.c AS HUGEINT) * b.c ELSE 0 END) AS disc
    |  FROM cells a CROSS JOIN cells b),
    |mg AS (
    |  SELECT sum(c) AS n, sum(CAST(c AS HUGEINT) * (c - 1)) AS sxy2
    |  FROM cells),
    |mx AS (SELECT sum(CAST(s AS HUGEINT) * (s - 1)) AS sx2
    |       FROM (SELECT sum(c) AS s FROM cells GROUP BY x) t),
    |my AS (SELECT sum(CAST(s AS HUGEINT) * (s - 1)) AS sy2
    |       FROM (SELECT sum(c) AS s FROM cells GROUP BY y) t)""".stripMargin

  /** Spark mirror of sqlPairs: one row with conc, disc, n, sx2, sy2,
    * sxy2 (DECIMAL(38,0) pair counts). */
  private def pairFrame(s: SparkSession, dir: String): DataFrame = {
    val cl = cells(s, dir).materialize() // ≤25-cell dim, feeds 4 uses
    val a = cl.select(col("x").as("ax"), col("y").as("ay"),
      col("c").as("ac"))
    val b = cl.select(col("x").as("bx"), col("y").as("by"),
      col("c").as("bc"))
    val pr = a.crossJoin(b).agg(
      sum(when(col("bx") > col("ax") && col("by") > col("ay"),
        col("ac").cast("decimal(38,0)") * col("bc")).otherwise(lit(0)))
        .as("conc"),
      sum(when(col("bx") > col("ax") && col("by") < col("ay"),
        col("ac").cast("decimal(38,0)") * col("bc")).otherwise(lit(0)))
        .as("disc"))
    val mg = cl.agg(sum(col("c")).as("n"),
      sum(col("c").cast("decimal(38,0)") * (col("c") - 1)).as("sxy2"))
    val mx = cl.groupBy(col("x")).agg(sum(col("c")).as("s"))
      .agg(sum(col("s").cast("decimal(38,0)") * (col("s") - 1)).as("sx2"))
    val my = cl.groupBy(col("y")).agg(sum(col("c")).as("s"))
      .agg(sum(col("s").cast("decimal(38,0)") * (col("s") - 1)).as("sy2"))
    pr.crossJoin(broadcast(mg)).crossJoin(broadcast(mx))
      .crossJoin(broadcast(my))
  }

  /** Somers' D in both directions: d_{Y|X} = (C−D)/(T−T_X) — the
    * asymmetric ordinal association of value band on priority (and
    * vice versa), the statistic under the Harrell c-index. Doubled
    * form 2(C−D)/(n(n−1)−sx2) keeps everything integer. */
  def q706: Q = Q(
    "q706_somers_d",
    Some(s"""
      |WITH ${sqlCells},
      |${sqlPairs}
      |SELECT CAST(n AS BIGINT) AS n_orders,
      |       CAST((2000000 * (conc - disc))
      |            // (CAST(n AS HUGEINT) * (n - 1) - sx2) AS BIGINT)
      |         AS d_yx_micro,
      |       CAST((2000000 * (conc - disc))
      |            // (CAST(n AS HUGEINT) * (n - 1) - sy2) AS BIGINT)
      |         AS d_xy_micro
      |FROM pr CROSS JOIN mg CROSS JOIN mx CROSS JOIN my
      |""".stripMargin)) { (s, dir) =>
    pairFrame(s, dir).select(
      col("n").cast("long").as("n_orders"),
      expr("CAST((2000000 * (conc - disc))" +
        " div (CAST(n AS DECIMAL(38,0)) * (n - 1) - sx2) AS BIGINT)")
        .as("d_yx_micro"),
      expr("CAST((2000000 * (conc - disc))" +
        " div (CAST(n AS DECIMAL(38,0)) * (n - 1) - sy2) AS BIGINT)")
        .as("d_xy_micro"))
  }

  /** Goodman–Kruskal gamma = (C−D)/(C+D) — association ignoring all
    * ties — plus the share of pairs tied on either margin (the mass
    * gamma throws away, ppm). */
  def q707: Q = Q(
    "q707_gk_gamma",
    Some(s"""
      |WITH ${sqlCells},
      |${sqlPairs}
      |SELECT CAST(n AS BIGINT) AS n_orders,
      |       CAST((1000000 * (conc - disc)) // (conc + disc) AS BIGINT)
      |         AS gamma_micro,
      |       CAST((1000000 * (sx2 + sy2 - sxy2))
      |            // (CAST(n AS HUGEINT) * (n - 1)) AS BIGINT)
      |         AS tied_share_ppm
      |FROM pr CROSS JOIN mg CROSS JOIN mx CROSS JOIN my
      |""".stripMargin)) { (s, dir) =>
    pairFrame(s, dir).select(
      col("n").cast("long").as("n_orders"),
      expr("CAST((1000000 * (conc - disc)) div (conc + disc) AS BIGINT)")
        .as("gamma_micro"),
      expr("CAST((1000000 * (sx2 + sy2 - sxy2))" +
        " div (CAST(n AS DECIMAL(38,0)) * (n - 1)) AS BIGINT)")
        .as("tied_share_ppm"))
  }

  /** Stuart's tau-c = 2m(C−D)/(n²(m−1)) with m = min(#rows, #cols)
    * OBSERVED — the tau variant that reaches ±1 on rectangular
    * tables; m is computed from the cells frame so degenerate small
    * scales stay honest. */
  def q708: Q = Q(
    "q708_stuart_tau_c",
    Some(s"""
      |WITH ${sqlCells},
      |${sqlPairs},
      |mm AS (
      |  SELECT least(count(DISTINCT x), count(DISTINCT y)) AS m
      |  FROM cells)
      |SELECT CAST(n AS BIGINT) AS n_orders, CAST(m AS BIGINT) AS m,
      |       CAST((2000000 * m * (conc - disc))
      |            // (CAST(n AS HUGEINT) * n * (m - 1)) AS BIGINT)
      |         AS tau_c_micro
      |FROM pr CROSS JOIN mg CROSS JOIN mm
      |""".stripMargin)) { (s, dir) =>
    val cl = cells(s, dir).materialize()
    val a = cl.select(col("x").as("ax"), col("y").as("ay"),
      col("c").as("ac"))
    val b = cl.select(col("x").as("bx"), col("y").as("by"),
      col("c").as("bc"))
    val pr = a.crossJoin(b).agg(
      sum(when(col("bx") > col("ax") && col("by") > col("ay"),
        col("ac").cast("decimal(38,0)") * col("bc")).otherwise(lit(0)))
        .as("conc"),
      sum(when(col("bx") > col("ax") && col("by") < col("ay"),
        col("ac").cast("decimal(38,0)") * col("bc")).otherwise(lit(0)))
        .as("disc"))
    val mg = cl.agg(sum(col("c")).as("n"))
    val mm = cl.agg(least(countDistinct(col("x")),
      countDistinct(col("y"))).as("m"))
    pr.crossJoin(broadcast(mg)).crossJoin(broadcast(mm))
      .select(col("n").cast("long").as("n_orders"),
        col("m").cast("long").as("m"),
        expr("CAST((2000000 * m * (conc - disc))" +
          " div (CAST(n AS DECIMAL(38,0)) * n * (m - 1)) AS BIGINT)")
          .as("tau_c_micro"))
  }

  /** Scott's pi for two deterministic "raters" of order urgency —
    * rater A buckets priority (1-2 / 3 / 4-5), rater B buckets value
    * (≥300k / ≥150k / rest) — chance agreement from POOLED marginals
    * (Scott), exact rational: pi = (4nΣn_ii − Σm_i²)/(4n² − Σm_i²)
    * with m_i = row_i + col_i. */
  def q709: Q = Q(
    "q709_scotts_pi",
    Some("""
      |WITH rt AS (
      |  SELECT CASE WHEN substr(o_orderpriority, 1, 1) <= '2' THEN 0
      |              WHEN substr(o_orderpriority, 1, 1) = '3' THEN 1
      |              ELSE 2 END AS a,
      |         CASE WHEN o_totalprice >= 300000 THEN 0
      |              WHEN o_totalprice >= 150000 THEN 1 ELSE 2 END AS b,
      |         count(*) AS c
      |  FROM orders GROUP BY 1, 2),
      |tot AS (SELECT sum(c) AS n,
      |               sum(CASE WHEN a = b THEN c ELSE 0 END) AS agree
      |        FROM rt),
      |mr AS (
      |  SELECT k, sum(ra) + sum(cb) AS m FROM (
      |    SELECT a AS k, c AS ra, 0 AS cb FROM rt
      |    UNION ALL SELECT b AS k, 0 AS ra, c AS cb FROM rt) u
      |  GROUP BY k),
      |ms AS (SELECT sum(CAST(m AS HUGEINT) * m) AS m2 FROM mr)
      |SELECT CAST(n AS BIGINT) AS n_orders,
      |       CAST((1000000 * agree) // n AS BIGINT) AS p_o_ppm,
      |       CAST((1000000 * (4 * CAST(n AS HUGEINT) * agree - m2))
      |            // (4 * CAST(n AS HUGEINT) * n - m2) AS BIGINT)
      |         AS pi_micro
      |FROM tot CROSS JOIN ms
      |""".stripMargin)) { (s, dir) =>
    val rt = Tables.orders(s, dir)
      .groupBy(
        expr("CASE WHEN substr(o_orderpriority, 1, 1) <= '2' THEN 0" +
          " WHEN substr(o_orderpriority, 1, 1) = '3' THEN 1" +
          " ELSE 2 END").as("a"),
        expr("CASE WHEN o_totalprice >= 300000 THEN 0" +
          " WHEN o_totalprice >= 150000 THEN 1 ELSE 2 END").as("b"))
      .agg(count(lit(1)).as("c"))
      .materialize() // ≤9-cell dim
    val tot = rt.agg(sum(col("c")).as("n"),
      sum(when(col("a") === col("b"), col("c")).otherwise(lit(0)))
        .as("agree"))
    val mr = rt.select(col("a").as("k"), col("c").as("ra"),
        lit(0L).as("cb"))
      .unionByName(rt.select(col("b").as("k"), lit(0L).as("ra"),
        col("c").as("cb")))
      .groupBy(col("k"))
      .agg((sum(col("ra")) + sum(col("cb"))).as("m"))
    val ms = mr.agg(sum(col("m").cast("decimal(38,0)") * col("m"))
      .as("m2"))
    tot.crossJoin(broadcast(ms))
      .select(col("n").cast("long").as("n_orders"),
        expr("CAST((1000000 * agree) div n AS BIGINT)").as("p_o_ppm"),
        expr("CAST((1000000 * (4 * CAST(n AS DECIMAL(38,0)) * agree" +
          " - m2)) div (4 * CAST(n AS DECIMAL(38,0)) * n - m2)" +
          " AS BIGINT)").as("pi_micro"))
  }

  /** Linear-weighted kappa on the 5×5 priority vs reversed value-band
    * grid (high value ↔ urgent): disagreement weights v_ij = |i−j|,
    * κ_w = 1 − n·Σv n_ij / Σv n_i· n_·j — all integer until the one
    * micro division. */
  def q710: Q = Q(
    "q710_weighted_kappa",
    Some("""
      |WITH rt AS (
      |  SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS a,
      |         5 - least(4, CAST(floor(o_totalprice / 100000)
      |                           AS BIGINT)) AS b,
      |         count(*) AS c
      |  FROM orders GROUP BY 1, 2),
      |tot AS (SELECT sum(c) AS n,
      |               sum(abs(a - b) * CAST(c AS HUGEINT)) AS wobs
      |        FROM rt),
      |ra AS (SELECT a, sum(c) AS na FROM rt GROUP BY 1),
      |cb AS (SELECT b, sum(c) AS nb FROM rt GROUP BY 1),
      |wexp AS (
      |  SELECT sum(abs(ra.a - cb.b) * CAST(ra.na AS HUGEINT) * cb.nb)
      |           AS we
      |  FROM ra CROSS JOIN cb)
      |SELECT CAST(n AS BIGINT) AS n_orders,
      |       CAST((1000000 * wobs) // n AS BIGINT)
      |         AS mean_abs_disagree_micro,
      |       CAST((1000000 * (we - CAST(n AS HUGEINT) * wobs)) // we
      |            AS BIGINT) AS kappa_w_micro
      |FROM tot CROSS JOIN wexp
      |""".stripMargin)) { (s, dir) =>
    val rt = Tables.orders(s, dir)
      .groupBy(
        expr("CAST(substr(o_orderpriority, 1, 1) AS BIGINT)").as("a"),
        expr("5 - least(4, CAST(floor(o_totalprice / 100000)" +
          " AS BIGINT))").as("b"))
      .agg(count(lit(1)).as("c"))
      .materialize() // ≤25-cell dim
    val tot = rt.agg(sum(col("c")).as("n"),
      sum(abs(col("a") - col("b")) * col("c").cast("decimal(38,0)"))
        .as("wobs"))
    val ra = rt.groupBy(col("a")).agg(sum(col("c")).as("na"))
    val cb = rt.groupBy(col("b")).agg(sum(col("c")).as("nb"))
    val wexp = ra.crossJoin(cb)
      .agg(sum(abs(col("a") - col("b"))
        * col("na").cast("decimal(38,0)") * col("nb")).as("we"))
    tot.crossJoin(broadcast(wexp))
      .select(col("n").cast("long").as("n_orders"),
        expr("CAST((1000000 * wobs) div n AS BIGINT)")
          .as("mean_abs_disagree_micro"),
        expr("CAST((1000000 * (we - CAST(n AS DECIMAL(38,0)) * wobs))" +
          " div we AS BIGINT)").as("kappa_w_micro"))
  }
}
