package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables
import graft.dedup.SortedNeighborhood

/** Round-9 Lorenz-family completion wave on floored customer balances
  * (the q881 welfare proxy), extending the shipped Gini/Lorenz/
  * asymmetry battery (q199/q544/q834): the Bonferroni index, the
  * Zenga-2007 index, the Amato index (Lorenz curve length), Dagum's
  * three-way Gini decomposition across market segments, and the
  * Donaldson-Weymark s-Gini (ν = 3).
  *
  * Scale: all per-rank statistics ride the bucket-parallel
  * [[SortedNeighborhood.globalRankCum]] spine with per-row integer
  * (or DECIMAL(18,9)-quantized) terms summed exactly; Dagum's
  * between-group term uses the exact rank identity
  * Σ_{cross pairs}|x−y| = S₁(all) − Σ_g S₁(g) — two rank-spine
  * passes, never a customer×customer join. */
object LorenzFamilyQueries {

  val all: Seq[Q] = Seq(q921, q922, q923, q924, q925)

  private def sqlRk: String = """
    |x AS (SELECT greatest(CAST(c_acctbal * 100 AS BIGINT), 0) AS v,
    |             c_custkey AS k FROM customer),
    |gl AS (SELECT count(*) AS n, sum(CAST(v AS HUGEINT)) AS s FROM x),
    |rk AS (SELECT v, row_number() OVER (ORDER BY v, k) AS i,
    |              sum(CAST(v AS HUGEINT)) OVER (ORDER BY v, k) AS cum
    |       FROM x)""".stripMargin

  /** Spark rank-cum spine (v, i, cum) + totals. */
  private def rkBase(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val x = Tables.customer(s, dir)
      .select(greatest(
        expr("CAST(CAST(c_acctbal * 100 AS DECIMAL(38,0)) AS LONG)"),
        lit(0L)).as("v"), col("c_custkey").as("k"))
      .withColumn("vb", expr("v div 1000000"))
    val rk = SortedNeighborhood.globalRankCum(x, "k", "vb", Seq("v"),
        cumCol = Some("v"))
      .select(col("v"), col("__rank").as("i"),
        col("__cum").cast("decimal(38,0)").as("cum"))
    val gl = x.agg(count(lit(1)).as("n"),
      sum(col("v").cast("decimal(38,0)")).as("s"))
    (rk, gl)
  }

  /** Bonferroni index: 1 − mean over i<n of (partial mean)/(grand
    * mean) — per-rank micro-floored integer terms, exact sum. */
  def q921: Q = Q(
    "q921_bonferroni_index",
    Some(s"""
      |WITH ${sqlRk},
      |bt AS (SELECT sum((1000000 * cum * gl.n) // (i * gl.s)) AS sb,
      |              count(*) AS m
      |       FROM rk CROSS JOIN gl WHERE i < gl.n)
      |SELECT CAST(1000000 - sb // m AS BIGINT)
      |         AS bonferroni_micro
      |FROM bt
      |""".stripMargin)) { (s, dir) =>
    val (rk, gl) = rkBase(s, dir)
    rk.crossJoin(broadcast(gl)).where(col("i") < col("n"))
      .select(expr("CAST((1000000 * cum * n" +
        " - (1000000 * cum * n) % (i * s)) / (i * s)" +
        " AS DECIMAL(38,0))").as("t"))
      .agg(sum(col("t")).as("sb"), count(lit(1)).as("m"))
      .select(expr("CAST(1000000 - (sb - sb % m) / m AS DECIMAL(38,0))")
        .cast("long").as("bonferroni_micro"))
  }

  /** Zenga-2007 index: 1 − mean of (L_i/p_i)·((1−p_i)/(1−L_i)) over
    * ranks i < n — per-rank pinned-double terms quantized 1e-9. */
  def q922: Q = Q(
    "q922_zenga_index",
    Some(s"""
      |WITH ${sqlRk},
      |zt AS (SELECT sum(CAST(
      |         (CAST(cum AS DOUBLE) * gl.n / (CAST(i AS DOUBLE) * gl.s))
      |         * ((gl.n - CAST(i AS DOUBLE)) * gl.s
      |            / (CAST(gl.n AS DOUBLE) * (gl.s - CAST(cum AS DOUBLE))))
      |         AS DECIMAL(18,9))) AS sz, count(*) AS m
      |       FROM rk CROSS JOIN gl WHERE i < gl.n)
      |SELECT CAST(floor(1000.0 * (1.0 - CAST(sz AS DOUBLE) / m))
      |            AS BIGINT) AS zenga_milli
      |FROM zt
      |""".stripMargin)) { (s, dir) =>
    val (rk, gl) = rkBase(s, dir)
    rk.crossJoin(broadcast(gl)).where(col("i") < col("n"))
      .select(expr("""CAST(
        |  (CAST(cum AS DOUBLE) * n / (CAST(i AS DOUBLE) * s))
        |  * ((n - CAST(i AS DOUBLE)) * s
        |     / (CAST(n AS DOUBLE) * (s - CAST(cum AS DOUBLE))))
        |  AS DECIMAL(18,9))""".stripMargin).as("t"))
      .agg(sum(col("t")).as("sz"), count(lit(1)).as("m"))
      .select(expr("CAST(floor(1000.0 * (1.0 - CAST(sz AS DOUBLE) / m))" +
        " AS BIGINT)").as("zenga_milli"))
  }

  /** Amato index: the Lorenz curve length
    * Σ√(1/n² + (xᵢ/S)²) ∈ [√2, 2] — per-row pinned sqrt quantized. */
  def q923: Q = Q(
    "q923_amato_index",
    Some(s"""
      |WITH ${sqlRk},
      |at AS (SELECT sum(CAST(sqrt(
      |         1.0 / (CAST(gl.n AS DOUBLE) * gl.n)
      |         + (CAST(v AS DOUBLE) / CAST(gl.s AS DOUBLE))
      |           * (CAST(v AS DOUBLE) / CAST(gl.s AS DOUBLE)))
      |         AS DECIMAL(18,9))) AS sa
      |       FROM rk CROSS JOIN gl)
      |SELECT CAST(floor(1000000.0 * CAST(sa AS DOUBLE)) AS BIGINT)
      |         AS amato_micro
      |FROM at
      |""".stripMargin)) { (s, dir) =>
    val (rk, gl) = rkBase(s, dir)
    rk.crossJoin(broadcast(gl))
      .select(expr("""CAST(sqrt(
        |  1.0 / (CAST(n AS DOUBLE) * n)
        |  + (CAST(v AS DOUBLE) / CAST(s AS DOUBLE))
        |    * (CAST(v AS DOUBLE) / CAST(s AS DOUBLE)))
        |  AS DECIMAL(18,9))""".stripMargin).as("t"))
      .agg(sum(col("t")).as("sa"))
      .select(expr("CAST(floor(1000000.0 * CAST(sa AS DOUBLE))" +
        " AS BIGINT)").as("amato_micro"))
  }

  /** Dagum between-segment Gini component via the exact rank
    * identity: Σ_{cross-group pairs}|x−y| = S₁(all) − Σ_g S₁(g) with
    * S₁ = Σ(2i−n−1)x₍ᵢ₎ — two rank-spine passes, never a pair join. */
  def q924: Q = Q(
    "q924_dagum_between",
    Some("""
      |WITH x AS (
      |  SELECT greatest(CAST(c_acctbal * 100 AS BIGINT), 0) AS v,
      |         c_mktsegment AS g, c_custkey AS k FROM customer),
      |gl AS (SELECT count(*) AS n, sum(CAST(v AS HUGEINT)) AS s FROM x),
      |ra AS (SELECT v, row_number() OVER (ORDER BY v, k) AS i FROM x),
      |s1 AS (SELECT sum((2 * CAST(i AS HUGEINT)
      |              - (SELECT n FROM gl) - 1) * v) AS t FROM ra),
      |rg AS (SELECT v, row_number() OVER (PARTITION BY g
      |         ORDER BY v, k) AS i,
      |         count(*) OVER (PARTITION BY g) AS ng FROM x),
      |sg AS (SELECT sum((2 * CAST(i AS HUGEINT) - ng - 1) * v) AS t
      |       FROM rg)
      |SELECT CAST(s1.t - sg.t AS BIGINT) AS between_pair_sum_cents,
      |       CAST((1000 * (s1.t - sg.t)) // (gl.n * gl.s) AS BIGINT)
      |         AS gini_between_milli
      |FROM s1 CROSS JOIN sg CROSS JOIN gl
      |""".stripMargin)) { (s, dir) =>
    val x = Tables.customer(s, dir)
      .select(greatest(
        expr("CAST(CAST(c_acctbal * 100 AS DECIMAL(38,0)) AS LONG)"),
        lit(0L)).as("v"), col("c_mktsegment").as("g"),
        col("c_custkey").as("k"))
      .withColumn("vb", expr("v div 1000000"))
      .materialize()
    val gl = x.agg(count(lit(1)).as("n"),
      sum(col("v").cast("decimal(38,0)")).as("s"))
    val s1 = SortedNeighborhood.globalRankCum(x, "k", "vb", Seq("v"))
      .crossJoin(broadcast(gl))
      .select(((col("__rank").cast("decimal(38,0)") * 2 - col("n") - 1)
        * col("v")).as("t"))
      .agg(sum(col("t")).as("t1"))
    val ng = x.groupBy(col("g")).agg(count(lit(1)).as("ng"))
    val sg = SortedNeighborhood.globalRankCum(x, "k", "vb", Seq("v"),
        partCols = Seq("g"))
      .join(broadcast(ng), Seq("g"))
      .select(((col("__rank").cast("decimal(38,0)") * 2 - col("ng") - 1)
        * col("v")).as("t"))
      .agg(sum(col("t")).as("t2"))
    s1.crossJoin(broadcast(sg)).crossJoin(broadcast(gl))
      .select((col("t1") - col("t2")).cast("long")
        .as("between_pair_sum_cents"),
        expr("CAST((1000 * (t1 - t2) - (1000 * (t1 - t2)) % (n * s))" +
          " / (n * s) AS DECIMAL(38,0))").cast("long")
          .as("gini_between_milli"))
  }

  /** Donaldson-Weymark s-Gini (ν = 3): 1 − Σ((n−i+1)³−(n−i)³)xᵢ/(n³μ)
    * — per-rank exact integer weights. */
  def q925: Q = Q(
    "q925_s_gini",
    Some(s"""
      |WITH ${sqlRk},
      |sg AS (SELECT sum((CAST(gl.n - i + 1 AS HUGEINT)
      |                   * (gl.n - i + 1) * (gl.n - i + 1)
      |                   - CAST(gl.n - i AS HUGEINT) * (gl.n - i)
      |                     * (gl.n - i)) * v) AS w
      |       FROM rk CROSS JOIN gl)
      |SELECT CAST(floor(1000.0 * (1.0 - CAST(sg.w AS DOUBLE)
      |            / (CAST(gl.n AS DOUBLE) * gl.n * gl.s))) AS BIGINT)
      |         AS s_gini3_milli
      |FROM sg CROSS JOIN gl
      |""".stripMargin)) { (s, dir) =>
    val (rk, gl) = rkBase(s, dir)
    rk.crossJoin(broadcast(gl))
      .select((((col("n") - col("i") + 1).cast("decimal(38,0)")
        * (col("n") - col("i") + 1) * (col("n") - col("i") + 1)
        - (col("n") - col("i")).cast("decimal(38,0)")
          * (col("n") - col("i")) * (col("n") - col("i")))
        * col("v")).as("t"))
      .agg(sum(col("t")).as("w"))
      .crossJoin(broadcast(gl))
      .select(expr("""CAST(floor(1000.0 * (1.0 - CAST(w AS DOUBLE)
        |  / (CAST(n AS DOUBLE) * n * s))) AS BIGINT)""".stripMargin)
        .as("s_gini3_milli"))
  }
}
