package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Materialize.MatOps
import graft.Tables

/** Round-9 inventory service-level wave on brand×month demand: z=1.645
  * safety stocks and reorder points, the ABC-XYZ planning matrix
  * (revenue Pareto × demand-variability class, both as EXACT integer
  * inequalities), empirical cycle/volume fill rates under the base
  * stock S = μ+1.645σ, the critical-ratio (cu:co = 9:1) empirical
  * newsquantile, and the risk-pooling variance benefit.
  *
  * Scale: one fact pass builds the 25-brand × ~83-month demand dim;
  * everything downstream is brand-dim aggregates. CV classes compare
  * n(nQ−S²) against (n−1)S² scaled — never a float CV (integer
  * division drift documented in NOTES round 9); fill rates are exact
  * count/volume ratios; the only doubles are the pinned z·σ chains. */
object InventoryServiceQueries {

  val all: Seq[Q] = Seq(q861, q862, q863, q864, q865)

  private def sqlBd: String = """
    |bd AS (
    |  SELECT p.p_brand AS b,
    |         (year(l.l_shipdate) - 1995) * 12 + month(l.l_shipdate) - 1
    |           AS m,
    |         sum(CAST(l.l_quantity AS BIGINT)) AS d,
    |         sum(CAST(l.l_extendedprice * 100 AS BIGINT)) AS rev
    |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    |  GROUP BY 1, 2),
    |st AS (
    |  SELECT b, count(*) AS nm, sum(d) AS sd2,
    |         sum(CAST(d AS HUGEINT) * d) AS qd, sum(rev) AS rv
    |  FROM bd GROUP BY 1)""".stripMargin

  private def bdBase(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_partkey"),
        ((year(col("l_shipdate")) - 1995) * 12
          + month(col("l_shipdate")) - 1).as("m"),
        col("l_quantity").cast("long").as("q"),
        expr("CAST(CAST(l_extendedprice * 100 AS DECIMAL(38,0)) AS LONG)")
          .as("v"))
      .join(Tables.part(s, dir).select(col("p_partkey"), col("p_brand").as("b")),
        col("p_partkey") === col("l_partkey"))
      .groupBy(col("b"), col("m"))
      .agg(sum(col("q")).as("d"), sum(col("v")).as("rev"))

  private def stBase(bd: DataFrame): DataFrame =
    bd.groupBy(col("b"))
      .agg(count(lit(1)).as("nm"), sum(col("d")).as("sd2"),
        sum(col("d").cast("decimal(38,0)") * col("d")).as("qd"),
        sum(col("rev")).as("rv"))

  private def sdD: String =
    "sqrt(CAST(nm * qd - sd2 * sd2 AS DOUBLE)" +
      " / (CAST(nm AS DOUBLE) * (nm - 1)))"

  /** Safety stock (z=1.645, one-period lead) and reorder point per
    * brand. */
  def q861: Q = Q(
    "q861_safety_stock",
    Some(s"""
      |WITH ${sqlBd}
      |SELECT b AS brand, CAST(nm AS BIGINT) AS n_months,
      |       CAST(sd2 // nm AS BIGINT) AS mean_demand,
      |       CAST(floor(1645.0 * ${sdD}) AS BIGINT)
      |         AS safety_stock_milli,
      |       CAST(sd2 // nm + floor(1.645 * ${sdD}) AS BIGINT)
      |         AS reorder_point
      |FROM st ORDER BY brand
      |""".stripMargin)) { (s, dir) =>
    stBase(bdBase(s, dir))
      .select(col("b").as("brand"), col("nm").cast("long").as("n_months"),
        expr("CAST(sd2 div nm AS BIGINT)").as("mean_demand"),
        expr(s"CAST(floor(1645.0 * ${sdD}) AS BIGINT)")
          .as("safety_stock_milli"),
        expr(s"CAST(sd2 div nm + floor(1.645 * ${sdD}) AS BIGINT)")
          .as("reorder_point"))
      .orderBy(col("brand"))
  }

  /** ABC-XYZ matrix: revenue Pareto classes (A ≤80%, B ≤95% of the
    * count-desc cumulative) × CV classes via exact integer
    * inequalities 4n(nQ−S²) ⋚ (n−1)S² (CV ⋚ ½) and n(nQ−S²) ⋚ (n−1)S²
    * (CV ⋚ 1). */
  def q862: Q = Q(
    "q862_abc_xyz_matrix",
    Some(s"""
      |WITH ${sqlBd},
      |rk AS (SELECT b, sum(rv) OVER (ORDER BY rv DESC, b) AS cum
      |       FROM st),
      |tt AS (SELECT sum(rv) AS t FROM st),
      |cls AS (
      |  SELECT st.b,
      |    CASE WHEN 5 * rk.cum <= 4 * tt.t THEN 'A'
      |         WHEN 20 * rk.cum <= 19 * tt.t THEN 'B' ELSE 'C' END
      |      AS abc,
      |    CASE WHEN 4 * st.nm * (st.nm * st.qd - st.sd2 * st.sd2)
      |              < (st.nm - 1) * st.sd2 * st.sd2 THEN 'X'
      |         WHEN st.nm * (st.nm * st.qd - st.sd2 * st.sd2)
      |              < (st.nm - 1) * st.sd2 * st.sd2 THEN 'Y'
      |         ELSE 'Z' END AS xyz
      |  FROM st JOIN rk ON rk.b = st.b CROSS JOIN tt)
      |SELECT abc, xyz, CAST(count(*) AS BIGINT) AS n_brands
      |FROM cls GROUP BY 1, 2 ORDER BY 1, 2
      |""".stripMargin)) { (s, dir) =>
    val st = stBase(bdBase(s, dir)).materialize()
    val rk = st.select(col("b").as("b2"),
      sum(col("rv")).over(Window.orderBy(col("rv").desc, col("b")))
        .as("cum"))
    val tt = st.agg(sum(col("rv")).as("t"))
    st.join(rk, col("b") === col("b2")).crossJoin(broadcast(tt))
      .select(
        when(col("cum") * 5 <= col("t") * 4, "A")
          .when(col("cum") * 20 <= col("t") * 19, "B")
          .otherwise("C").as("abc"),
        when(expr("4 * nm * (nm * qd - sd2 * sd2)")
          < expr("(nm - 1) * sd2 * sd2"), "X")
          .when(expr("nm * (nm * qd - sd2 * sd2)")
            < expr("(nm - 1) * sd2 * sd2"), "Y")
          .otherwise("Z").as("xyz"))
      .groupBy(col("abc"), col("xyz"))
      .agg(count(lit(1)).as("n"))
      .select(col("abc"), col("xyz"), col("n").cast("long").as("n_brands"))
      .orderBy(col("abc"), col("xyz"))
  }

  /** Empirical fill rates under base stock S = μ + 1.645σ (floored):
    * cycle service (months fully served) and volume fill Σmin(d,S)/Σd. */
  def q863: Q = Q(
    "q863_fill_rates",
    Some(s"""
      |WITH ${sqlBd},
      |ss AS (SELECT b, CAST(sd2 // nm + floor(1.645 * ${sdD})
      |              AS BIGINT) AS cap FROM st),
      |fr AS (
      |  SELECT bd.b, count(*) AS nm,
      |         sum(CASE WHEN bd.d <= ss.cap THEN 1 ELSE 0 END) AS ok,
      |         sum(least(bd.d, ss.cap)) AS served, sum(bd.d) AS dem
      |  FROM bd JOIN ss ON ss.b = bd.b GROUP BY 1)
      |SELECT b AS brand,
      |       CAST((1000 * ok) // nm AS BIGINT) AS cycle_service_milli,
      |       CAST((1000 * served) // dem AS BIGINT) AS volume_fill_milli
      |FROM fr ORDER BY brand
      |""".stripMargin)) { (s, dir) =>
    val bd = bdBase(s, dir).materialize()
    val ss = stBase(bd).select(col("b"),
      expr(s"CAST(sd2 div nm + floor(1.645 * ${sdD}) AS BIGINT)")
        .as("cap"))
    bd.join(broadcast(ss), Seq("b"))
      .groupBy(col("b"))
      .agg(count(lit(1)).as("nm"),
        sum(when(col("d") <= col("cap"), 1).otherwise(0)).as("ok"),
        sum(least(col("d"), col("cap"))).as("served"),
        sum(col("d")).as("dem"))
      .select(col("b").as("brand"),
        expr("CAST((1000 * ok) div nm AS BIGINT)")
          .as("cycle_service_milli"),
        expr("CAST((1000 * served) div dem AS BIGINT)")
          .as("volume_fill_milli"))
      .orderBy(col("brand"))
  }

  /** Critical-ratio newsquantile: with cu:co = 9:1 the optimal base
    * stock is the 90% empirical demand quantile per brand (ECDF
    * convention, partitioned ranks). */
  def q864: Q = Q(
    "q864_critical_ratio_stock",
    Some(s"""
      |WITH ${sqlBd},
      |rk AS (SELECT b, d, row_number() OVER (PARTITION BY b
      |         ORDER BY d, m) AS r, count(*) OVER (PARTITION BY b)
      |         AS nm FROM bd)
      |SELECT b AS brand, CAST(max(nm) AS BIGINT) AS n_months,
      |       CAST(min(CASE WHEN 10 * r >= 9 * nm THEN d END) AS BIGINT)
      |         AS s_opt_q90
      |FROM rk GROUP BY 1 ORDER BY brand
      |""".stripMargin)) { (s, dir) =>
    val bd = bdBase(s, dir)
    val w = Window.partitionBy(col("b"))
    bd.select(col("b"), col("d"),
        row_number().over(w.orderBy(col("d"), col("m"))).as("r"),
        count(lit(1)).over(w).as("nm"))
      .groupBy(col("b"))
      .agg(max(col("nm")).as("nmx"),
        min(when(col("r") * 10 >= col("nm") * 9, col("d"))).as("s90"))
      .select(col("b").as("brand"), col("nmx").cast("long").as("n_months"),
        col("s90").cast("long").as("s_opt_q90"))
      .orderBy(col("brand"))
  }

  /** Risk-pooling benefit: σ of the POOLED monthly demand vs the sum
    * of per-brand σ — the square-root-law variance reduction. */
  def q865: Q = Q(
    "q865_risk_pooling",
    Some(s"""
      |WITH ${sqlBd},
      |pool AS (
      |  SELECT m, sum(d) AS d FROM bd GROUP BY 1),
      |pm AS (SELECT count(*) AS nm, sum(d) AS sd2,
      |              sum(CAST(d AS HUGEINT) * d) AS qd FROM pool),
      |bs AS (SELECT sum(CAST(floor(1000.0 * ${sdD}) AS BIGINT)) AS ssd
      |       FROM st)
      |SELECT CAST(floor(1000.0 * sqrt(CAST(pm.nm * pm.qd
      |            - pm.sd2 * pm.sd2 AS DOUBLE)
      |            / (CAST(pm.nm AS DOUBLE) * (pm.nm - 1)))) AS BIGINT)
      |         AS pooled_sd_milli,
      |       CAST(bs.ssd AS BIGINT) AS sum_brand_sd_milli,
      |       CAST((1000 * CAST(floor(1000.0 * sqrt(CAST(pm.nm * pm.qd
      |            - pm.sd2 * pm.sd2 AS DOUBLE)
      |            / (CAST(pm.nm AS DOUBLE) * (pm.nm - 1)))) AS BIGINT))
      |            // bs.ssd AS BIGINT) AS pooling_factor_milli
      |FROM pm CROSS JOIN bs
      |""".stripMargin)) { (s, dir) =>
    val bd = bdBase(s, dir).materialize()
    val pm = bd.groupBy(col("m")).agg(sum(col("d")).as("d"))
      .select(col("d").cast("decimal(38,0)").as("dd"))
      .agg(count(lit(1)).as("nm"), sum(col("dd")).as("sd2"),
        sum(col("dd") * col("dd")).as("qd"))
    val bs = stBase(bd)
      .select(expr(s"CAST(floor(1000.0 * ${sdD}) AS BIGINT)").as("sdm"))
      .agg(sum(col("sdm")).as("ssd"))
    pm.crossJoin(broadcast(bs))
      .select(
        expr("""CAST(floor(1000.0 * sqrt(CAST(nm * qd - sd2 * sd2
          |  AS DOUBLE) / (CAST(nm AS DOUBLE) * (nm - 1)))) AS BIGINT)"""
          .stripMargin).as("pooled_sd_milli"),
        col("ssd").cast("long").as("sum_brand_sd_milli"),
        expr("""CAST((1000 * CAST(floor(1000.0 * sqrt(CAST(nm * qd
          |  - sd2 * sd2 AS DOUBLE) / (CAST(nm AS DOUBLE) * (nm - 1))))
          |  AS BIGINT)) div ssd AS BIGINT)""".stripMargin)
          .as("pooling_factor_milli"))
  }
}
