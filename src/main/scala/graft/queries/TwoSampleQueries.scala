package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Materialize.MatOps
import graft.Tables

/** Round-10 two-sample location–scale completion (kept vs returned
  * lineitem quantities): the Lepage combined location+scale test, the
  * Cucconi squared-rank test, Conover's squared-ranks dispersion test
  * on deviations from the group medians, the Fligner–Policello robust
  * placement test, and Rosenbaum's tail-exceedance counts (on price
  * cents, where extrema are informative).
  *
  * Exactness discipline (the q689/q690 histogram idiom): everything
  * reduces over the bounded VALUE HISTOGRAM with doubled midranks
  * (mr2 = 2·before + cnt + 1) so every rank/score/moment sum is an
  * exact integer; standardized statistics apply ONE same-op-order
  * double formula to those exact operands (the finite-population
  * score variance Var(S) = n₁n₂(N·Σs² − (Σs)²)/(N²(N−1))), so both
  * engines land identical doubles and identical floors.
  *
  * Scale: one fact scan to the ≤50-row histogram; all windows run
  * over that dim. */
object TwoSampleQueries {

  val all: Seq[Q] = Seq(q1016, q1017, q1018, q1019, q1020)

  /** Histogram + midranks + scalars: h(v, cx, cy),
    * mr(v, cx, cy, mr2, byb, bxb) (byb/bxb = counts strictly below in
    * the OTHER sample ×1), mo(nx, ny, n). */
  private def sqlMr: String = """
    |h AS (
    |  SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS v,
    |         sum(CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END) AS cx,
    |         sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS cy
    |  FROM lineitem GROUP BY 1),
    |mr AS (
    |  SELECT v, cx, cy,
    |         2 * coalesce(sum(cx + cy) OVER wb, 0) + (cx + cy) + 1
    |           AS mr2,
    |         coalesce(sum(cy) OVER wb, 0) AS byb,
    |         coalesce(sum(cx) OVER wb, 0) AS bxb
    |  FROM h WINDOW wb AS (ORDER BY v
    |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
    |mo AS (SELECT sum(cx) AS nx, sum(cy) AS ny, sum(cx + cy) AS n
    |       FROM h)""".stripMargin

  /** Spark twin: (mr frame, 1-row scalars mo(nx, ny, n)). */
  private def mrBase(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    // ≤50-value histogram as a SpineCache SPINE TABLE (VERDICT r10
    // #2): q1016-q1019 each previously paid the full lineitem scan to
    // rebuild this identical doubled-midrank base; now one
    // fingerprint-keyed build serves this wave AND q1066-q1070
    // (single builder definition in QtyHistogram — one spine name,
    // one build logic)
    val h = QtyHistogram.table(s, dir)
    val wb = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val mr = h.select(col("v"), col("cx"), col("cy"),
      (lit(2L) * coalesce(sum(col("cx") + col("cy")).over(wb), lit(0L))
        + (col("cx") + col("cy")) + 1).as("mr2"),
      coalesce(sum(col("cy")).over(wb), lit(0L)).as("byb"),
      coalesce(sum(col("cx")).over(wb), lit(0L)).as("bxb"))
    val mo = h.agg(sum(col("cx")).as("nx"), sum(col("cy")).as("ny"),
      sum(col("cx") + col("cy")).as("n"))
    (mr, mo)
  }

  /** The shared double formula z² = (N·S − n₁·T)²·(N−1) /
    * (n₁·n₂·(N·M − T²)) as SQL text over exact integer columns
    * (s1 = sample-1 score sum, t = total score sum, m = total score²
    * sum). */
  private def z2Sql(s1: String, t: String, m: String,
      n1: String): String =
    s"""(CAST(n * $s1 - $n1 * $t AS DOUBLE)
       | * CAST(n * $s1 - $n1 * $t AS DOUBLE) * CAST(n - 1 AS DOUBLE))
       | / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE)
       |    * CAST(n * $m - CAST($t AS DOUBLE) * $t AS DOUBLE))"""
      .stripMargin.replace("\n", " ")

  /** Lepage combined location+scale: zW² + zAB² (Wilcoxon midranks +
    * Ansari–Bradley folded scores, exact sums, one double step). */
  def q1016: Q = Q(
    "q1016_lepage_test",
    Some(s"""
      |WITH ${sqlMr},
      |sc AS (
      |  SELECT mr.*, mo.n,
      |         CASE WHEN mr2 < 2 * (mo.n + 1) - mr2 THEN mr2
      |              ELSE 2 * (mo.n + 1) - mr2 END AS ab2
      |  FROM mr CROSS JOIN mo),
      |ag AS (
      |  SELECT sum(CAST(cy AS HUGEINT) * mr2) AS wy,
      |         sum(CAST(cx + cy AS HUGEINT) * mr2) AS wt,
      |         sum(CAST(cx + cy AS HUGEINT) * mr2 * mr2) AS wm,
      |         sum(CAST(cy AS HUGEINT) * ab2) AS ay,
      |         sum(CAST(cx + cy AS HUGEINT) * ab2) AS at2,
      |         sum(CAST(cx + cy AS HUGEINT) * ab2 * ab2) AS am
      |  FROM sc),
      |fin AS (SELECT ag.*, mo.nx, mo.ny, mo.n FROM ag CROSS JOIN mo)
      |SELECT CAST(wy AS BIGINT) AS wilcoxon_x2,
      |       CAST(ay AS BIGINT) AS ansari_x2,
      |       CAST(floor(1000.0 * (${z2Sql("wy", "wt", "wm", "ny")}
      |            + ${z2Sql("ay", "at2", "am", "ny")})) AS BIGINT)
      |         AS lepage_milli
      |FROM fin
      |""".stripMargin)) { (s, dir) =>
    val (mr, mo) = mrBase(s, dir)
    val sc = mr.crossJoin(broadcast(mo))
      .withColumn("ab2",
        when(col("mr2") < lit(2) * (col("n") + 1) - col("mr2"),
          col("mr2")).otherwise(lit(2) * (col("n") + 1) - col("mr2")))
    sc.agg(
        sum(col("cy").cast("decimal(38,0)") * col("mr2")).as("wy"),
        sum((col("cx") + col("cy")).cast("decimal(38,0)") * col("mr2"))
          .as("wt"),
        sum((col("cx") + col("cy")).cast("decimal(38,0)") * col("mr2")
          * col("mr2")).as("wm"),
        sum(col("cy").cast("decimal(38,0)") * col("ab2")).as("ay"),
        sum((col("cx") + col("cy")).cast("decimal(38,0)") * col("ab2"))
          .as("at2"),
        sum((col("cx") + col("cy")).cast("decimal(38,0)") * col("ab2")
          * col("ab2")).as("am"))
      .crossJoin(broadcast(mo))
      .select(col("wy").cast("long").as("wilcoxon_x2"),
        col("ay").cast("long").as("ansari_x2"),
        expr(s"CAST(floor(1000.0 * (${z2Sql("wy", "wt", "wm", "ny")}" +
          s" + ${z2Sql("ay", "at2", "am", "ny")})) AS BIGINT)")
          .as("lepage_milli"))
  }

  /** Cucconi squared-rank test: U (squared midranks), V (squared
    * contrary midranks), C = (U² + V² − 2ρUV)/(2(1−ρ²)). */
  def q1017: Q = Q(
    "q1017_cucconi_test",
    Some(s"""
      |WITH ${sqlMr},
      |ag AS (
      |  SELECT sum(CAST(cy AS HUGEINT) * mr2 * mr2) AS s4,
      |         sum(CAST(cy AS HUGEINT) * (2 * (mo.n + 1) - mr2)
      |             * (2 * (mo.n + 1) - mr2)) AS s4c
      |  FROM mr CROSS JOIN mo GROUP BY mo.nx, mo.ny, mo.n),
      |fin AS (SELECT ag.*, mo.nx, mo.ny, mo.n FROM ag CROSS JOIN mo),
      |st AS (
      |  SELECT s4, s4c, nx, ny, n,
      |    ((6.0 * CAST(s4 AS DOUBLE) / 4.0
      |      - CAST(ny AS DOUBLE) * (n + 1) * (2 * n + 1))
      |     / sqrt(CAST(nx AS DOUBLE) * ny * (n + 1) * (2 * n + 1)
      |            * (8 * n + 11) / 5.0)) AS u,
      |    ((6.0 * CAST(s4c AS DOUBLE) / 4.0
      |      - CAST(ny AS DOUBLE) * (n + 1) * (2 * n + 1))
      |     / sqrt(CAST(nx AS DOUBLE) * ny * (n + 1) * (2 * n + 1)
      |            * (8 * n + 11) / 5.0)) AS v,
      |    (2.0 * (CAST(n AS DOUBLE) * n - 4)
      |     / ((2 * CAST(n AS DOUBLE) + 1) * (8 * CAST(n AS DOUBLE) + 11))
      |     - 1.0) AS rho
      |  FROM fin)
      |SELECT CAST(s4 // 1000 AS BIGINT) AS sq_rank_sum_e3,
      |       CAST(s4c // 1000 AS BIGINT) AS contrary_sq_rank_sum_e3,
      |       CAST(floor(1000.0 * (u * u + v * v - 2 * rho * u * v)
      |            / (2 * (1 - rho * rho))) AS BIGINT) AS cucconi_milli
      |FROM st
      |""".stripMargin)) { (s, dir) =>
    val (mr, mo) = mrBase(s, dir)
    val ag = mr.crossJoin(broadcast(mo))
      .agg(sum(col("cy").cast("decimal(38,0)") * col("mr2")
        * col("mr2")).as("s4"),
        sum(col("cy").cast("decimal(38,0)")
          * (lit(2) * (col("n") + 1) - col("mr2"))
          * (lit(2) * (col("n") + 1) - col("mr2"))).as("s4c"),
        first(col("nx")).as("nx"), first(col("ny")).as("ny"),
        first(col("n")).as("n"))
    val st = ag.select(col("s4"), col("s4c"), col("nx"), col("ny"),
      col("n"),
      expr("""((6.0 * CAST(s4 AS DOUBLE) / 4.0
        |  - CAST(ny AS DOUBLE) * (n + 1) * (2 * n + 1))
        | / sqrt(CAST(nx AS DOUBLE) * ny * (n + 1) * (2 * n + 1)
        |        * (8 * n + 11) / 5.0))""".stripMargin.replace("\n", " "))
        .as("u"),
      expr("""((6.0 * CAST(s4c AS DOUBLE) / 4.0
        |  - CAST(ny AS DOUBLE) * (n + 1) * (2 * n + 1))
        | / sqrt(CAST(nx AS DOUBLE) * ny * (n + 1) * (2 * n + 1)
        |        * (8 * n + 11) / 5.0))""".stripMargin.replace("\n", " "))
        .as("v"),
      expr("""(2.0 * (CAST(n AS DOUBLE) * n - 4)
        | / ((2 * CAST(n AS DOUBLE) + 1) * (8 * CAST(n AS DOUBLE) + 11))
        | - 1.0)""".stripMargin.replace("\n", " ")).as("rho"))
    st.select(expr("CAST(s4 div 1000 AS BIGINT)").as("sq_rank_sum_e3"),
      expr("CAST(s4c div 1000 AS BIGINT)").as("contrary_sq_rank_sum_e3"),
      expr("CAST(floor(1000.0 * (u * u + v * v - 2 * rho * u * v)" +
        " / (2 * (1 - rho * rho))) AS BIGINT)").as("cucconi_milli"))
  }

  /** Conover squared-ranks dispersion test on |v − group median|
    * (medians exact order stats from the histogram; scores are
    * squared pooled midranks; the shared z² formula standardizes). */
  def q1018: Q = Q(
    "q1018_conover_squared_ranks",
    Some(s"""
      |WITH ${sqlMr},
      |cum AS (
      |  SELECT v, cx, cy,
      |         sum(cx) OVER (ORDER BY v) AS ax,
      |         sum(cy) OVER (ORDER BY v) AS ay
      |  FROM h),
      |md AS (
      |  SELECT (SELECT min(v) FROM cum CROSS JOIN mo
      |          WHERE 2 * ax >= mo.nx) AS mx,
      |         (SELECT min(v) FROM cum CROSS JOIN mo
      |          WHERE 2 * ay >= mo.ny) AS my),
      |dh AS (
      |  SELECT d, sum(cx) AS cx, sum(cy) AS cy FROM (
      |    SELECT abs(v - md.mx) AS d, cx, CAST(0 AS BIGINT) AS cy
      |    FROM h CROSS JOIN md
      |    UNION ALL
      |    SELECT abs(v - md.my), CAST(0 AS BIGINT), cy
      |    FROM h CROSS JOIN md) u GROUP BY 1),
      |dmr AS (
      |  SELECT d, cx, cy,
      |         2 * coalesce(sum(cx + cy) OVER (ORDER BY d
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |           + (cx + cy) + 1 AS mr2
      |  FROM dh),
      |ag AS (
      |  SELECT sum(CAST(cy AS HUGEINT) * mr2 * mr2) AS ty,
      |         sum(CAST(cx + cy AS HUGEINT) * mr2 * mr2) AS tt,
      |         sum(CAST(cx + cy AS HUGEINT) * mr2 * mr2
      |             * mr2 * mr2) AS tm
      |  FROM dmr),
      |fin AS (SELECT ag.*, mo.nx, mo.ny, mo.n, md.mx, md.my
      |        FROM ag CROSS JOIN mo CROSS JOIN md)
      |SELECT CAST(mx AS BIGINT) AS median_kept,
      |       CAST(my AS BIGINT) AS median_returned,
      |       CAST(ty // 1000 AS BIGINT) AS sq_rank_sum_e3,
      |       CAST(floor(1000.0 * ${z2Sql("ty", "tt", "tm", "ny")})
      |            AS BIGINT) AS conover_z2_milli
      |FROM fin
      |""".stripMargin)) { (s, dir) =>
    val (mr, mo) = mrBase(s, dir)
    val h = mr.select(col("v"), col("cx"), col("cy"))
    val cw = Window.orderBy(col("v"))
    val cum = h.select(col("v"), col("cx"), col("cy"),
      sum(col("cx")).over(cw).as("ax"), sum(col("cy")).over(cw).as("ay"))
      .crossJoin(broadcast(mo))
    val mx = cum.where(col("ax") * 2 >= col("nx"))
      .agg(min(col("v")).as("mx"))
    val my = cum.where(col("ay") * 2 >= col("ny"))
      .agg(min(col("v")).as("my"))
    val md = broadcast(mx.crossJoin(broadcast(my)))
    val dh = h.crossJoin(md)
      .select(abs(col("v") - col("mx")).as("d"), col("cx"),
        lit(0L).as("cy"))
      .unionAll(h.crossJoin(md)
        .select(abs(col("v") - col("my")).as("d"), lit(0L).as("cx"),
          col("cy")))
      .groupBy(col("d"))
      .agg(sum(col("cx")).as("cx"), sum(col("cy")).as("cy"))
    val wb = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val dmr = dh.select(col("cx"), col("cy"),
      (lit(2L) * coalesce(sum(col("cx") + col("cy")).over(wb), lit(0L))
        + (col("cx") + col("cy")) + 1).as("mr2"))
    dmr.agg(
        sum(col("cy").cast("decimal(38,0)") * col("mr2") * col("mr2"))
          .as("ty"),
        sum((col("cx") + col("cy")).cast("decimal(38,0)") * col("mr2")
          * col("mr2")).as("tt"),
        sum((col("cx") + col("cy")).cast("decimal(38,0)") * col("mr2")
          * col("mr2") * col("mr2") * col("mr2")).as("tm"))
      .crossJoin(broadcast(mo)).crossJoin(md)
      .select(col("mx").cast("long").as("median_kept"),
        col("my").cast("long").as("median_returned"),
        expr("CAST(ty div 1000 AS BIGINT)").as("sq_rank_sum_e3"),
        expr(s"CAST(floor(1000.0 * ${z2Sql("ty", "tt", "tm", "ny")})" +
          " AS BIGINT)").as("conover_z2_milli"))
  }

  /** Fligner–Policello robust placement test: doubled placements
    * p2(x) = 2·#{y < x} + #{y = x}, dispersions from exact moment
    * sums, z through one double formula. */
  def q1019: Q = Q(
    "q1019_fligner_policello",
    Some(s"""
      |WITH ${sqlMr},
      |pl AS (
      |  SELECT cx, cy,
      |         2 * byb + cy AS px2,
      |         2 * bxb + cx AS py2
      |  FROM mr),
      |ag AS (
      |  SELECT sum(CAST(cx AS HUGEINT) * px2) AS sx,
      |         sum(CAST(cx AS HUGEINT) * px2 * px2) AS sxx,
      |         sum(CAST(cy AS HUGEINT) * py2) AS sy,
      |         sum(CAST(cy AS HUGEINT) * py2 * py2) AS syy
      |  FROM pl),
      |fin AS (SELECT ag.*, mo.nx, mo.ny FROM ag CROSS JOIN mo)
      |SELECT CAST(sx AS BIGINT) AS placements_x_x2,
      |       CAST(sy AS BIGINT) AS placements_y_x2,
      |       CAST(floor(1000.0 * (CAST(sy - sx AS DOUBLE)
      |            / (2.0 * sqrt(
      |              (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / nx)
      |            + (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / ny)
      |            + (CAST(sx AS DOUBLE) / nx)
      |              * (CAST(sy AS DOUBLE) / ny))))) AS BIGINT)
      |         AS fp_z_milli
      |FROM fin
      |""".stripMargin)) { (s, dir) =>
    val (mr, mo) = mrBase(s, dir)
    val pl = mr.select(col("cx"), col("cy"),
      (lit(2L) * col("byb") + col("cy")).as("px2"),
      (lit(2L) * col("bxb") + col("cx")).as("py2"))
    pl.agg(sum(col("cx").cast("decimal(38,0)") * col("px2")).as("sx"),
        sum(col("cx").cast("decimal(38,0)") * col("px2") * col("px2"))
          .as("sxx"),
        sum(col("cy").cast("decimal(38,0)") * col("py2")).as("sy"),
        sum(col("cy").cast("decimal(38,0)") * col("py2") * col("py2"))
          .as("syy"))
      .crossJoin(broadcast(mo))
      .select(col("sx").cast("long").as("placements_x_x2"),
        col("sy").cast("long").as("placements_y_x2"),
        expr("""CAST(floor(1000.0 * (CAST(sy - sx AS DOUBLE)
          | / (2.0 * sqrt(
          |   (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / nx)
          | + (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / ny)
          | + (CAST(sx AS DOUBLE) / nx)
          |   * (CAST(sy AS DOUBLE) / ny))))) AS BIGINT)"""
          .stripMargin.replace("\n", " ")).as("fp_z_milli"))
  }

  /** Rosenbaum tail-exceedance counts on price cents (quantity
    * extrema saturate — both groups reach 1 and 50 — so the tail test
    * runs where extrema discriminate). */
  def q1020: Q = Q(
    "q1020_rosenbaum_tails",
    Some("""
      |WITH px AS (
      |  SELECT CAST(l_extendedprice * 100 AS BIGINT) AS v,
      |         l_returnflag = 'R' AS isy
      |  FROM lineitem),
      |ex AS (SELECT max(CASE WHEN NOT isy THEN v END) AS mxx,
      |              max(CASE WHEN isy THEN v END) AS mxy,
      |              min(CASE WHEN NOT isy THEN v END) AS mnx,
      |              min(CASE WHEN isy THEN v END) AS mny
      |       FROM px)
      |SELECT CAST(sum(CASE WHEN isy AND v > ex.mxx THEN 1 ELSE 0 END)
      |            AS BIGINT) AS returned_above_kept_max,
      |       CAST(sum(CASE WHEN NOT isy AND v > ex.mxy THEN 1 ELSE 0
      |            END) AS BIGINT) AS kept_above_returned_max,
      |       CAST(sum(CASE WHEN isy AND v < ex.mnx THEN 1 ELSE 0 END)
      |            AS BIGINT) AS returned_below_kept_min,
      |       CAST(sum(CASE WHEN NOT isy AND v < ex.mny THEN 1 ELSE 0
      |            END) AS BIGINT) AS kept_below_returned_min
      |FROM px CROSS JOIN ex
      |""".stripMargin)) { (s, dir) =>
    val px = Tables.lineitem(s, dir)
      .select(expr("CAST(CAST(l_extendedprice * 100 AS DECIMAL(38,0))" +
        " AS LONG)").as("v"),
        (col("l_returnflag") === "R").as("isy"))
    val ex = px.agg(
      max(when(!col("isy"), col("v"))).as("mxx"),
      max(when(col("isy"), col("v"))).as("mxy"),
      min(when(!col("isy"), col("v"))).as("mnx"),
      min(when(col("isy"), col("v"))).as("mny"))
    px.crossJoin(broadcast(ex))
      .agg(sum(when(col("isy") && col("v") > col("mxx"), 1L)
        .otherwise(0L)).as("returned_above_kept_max"),
        sum(when(!col("isy") && col("v") > col("mxy"), 1L)
          .otherwise(0L)).as("kept_above_returned_max"),
        sum(when(col("isy") && col("v") < col("mnx"), 1L)
          .otherwise(0L)).as("returned_below_kept_min"),
        sum(when(!col("isy") && col("v") < col("mny"), 1L)
          .otherwise(0L)).as("kept_below_returned_min"))
  }
}
