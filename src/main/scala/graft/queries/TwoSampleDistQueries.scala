package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** The kept-vs-returned quantity value histogram (v, cx, cy) as a
  * shared SpineCache spine — the base frame of the two-sample waves
  * (q1016-q1019 and q1066-q1070). */
object QtyHistogram {
  def table(s: SparkSession, dir: String): DataFrame =
    graft.sources.SpineCache.table(s, dir, "qty_histogram",
      Seq("lineitem")) {
      Tables.lineitem(s, dir)
        .groupBy(expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").as("v"))
        .agg(sum(when(col("l_returnflag") === "R", 0L).otherwise(1L))
          .as("cx"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
            .as("cy"))
    }
}

/** Round-11 two-sample completion II (kept vs returned lineitem
  * quantities, all from the bounded value histogram): the win ratio,
  * Mood's median test, the G-test of return-flag × line-status
  * independence, the Hellinger/Bhattacharyya/total-variation distance
  * panel, and the overlap coefficient.
  *
  * Exactness: wins/ties/overlap/TV are PURE integer rationals of
  * histogram counts (pairwise wins via the strictly-below cumulative,
  * min(p, q) via min(cx·ny, cy·nx)); G-test and Hellinger quantize
  * each O·ln / sqrt term to DECIMAL(28,6) before the exact sum (the
  * PSI discipline); chi-square finishes in one shared-text double
  * formula.
  *
  * Scale: one fact scan to the ≤50-row histogram (a SpineCache spine
  * shared with q1016-q1019); everything else is histogram-dim. */
object TwoSampleDistQueries {

  val all: Seq[Q] = Seq(q1066, q1067, q1068, q1069, q1070)

  /** Oracle histogram CTE (identical to the q1016 wave's `h`). */
  private def sqlH: String = """
    |h AS (
    |  SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS v,
    |         sum(CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END) AS cx,
    |         sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS cy
    |  FROM lineitem GROUP BY 1),
    |mo AS (SELECT sum(cx) AS nx, sum(cy) AS ny FROM h)""".stripMargin

  /** Win ratio (returned over kept) from exact pairwise win counts. */
  def q1066: Q = Q(
    "q1066_win_ratio",
    Some(s"""
      |WITH ${sqlH},
      |cb AS (SELECT v, cx, cy,
      |              coalesce(sum(cx) OVER wb, 0) AS bxb,
      |              coalesce(sum(cy) OVER wb, 0) AS byb
      |       FROM h WINDOW wb AS (ORDER BY v
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      |ag AS (SELECT sum(CAST(cy AS HUGEINT) * bxb) AS wy,
      |              sum(CAST(cx AS HUGEINT) * byb) AS wx,
      |              sum(CAST(cx AS HUGEINT) * cy) AS tie
      |       FROM cb)
      |SELECT CAST(wy AS BIGINT) AS wins_returned,
      |       CAST(wx AS BIGINT) AS wins_kept,
      |       CAST(tie AS BIGINT) AS ties,
      |       CAST((1000 * wy) // wx AS BIGINT) AS win_ratio_milli,
      |       CAST(floor(1000.0 * ln(CAST(wy AS DOUBLE)
      |            / CAST(wx AS DOUBLE))) AS BIGINT) AS log_wr_milli
      |FROM ag
      |""".stripMargin)) { (s, dir) =>
    val wb = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    QtyHistogram.table(s, dir)
      .select(col("cx"), col("cy"),
        coalesce(sum(col("cx")).over(wb), lit(0L)).as("bxb"),
        coalesce(sum(col("cy")).over(wb), lit(0L)).as("byb"))
      .agg(sum(expr("CAST(cy AS DECIMAL(38,0)) * bxb")).as("wy"),
        sum(expr("CAST(cx AS DECIMAL(38,0)) * byb")).as("wx"),
        sum(expr("CAST(cx AS DECIMAL(38,0)) * cy")).as("tie"))
      .select(col("wy").cast("long").as("wins_returned"),
        col("wx").cast("long").as("wins_kept"),
        col("tie").cast("long").as("ties"),
        expr("CAST((1000 * wy) div wx AS BIGINT)")
          .as("win_ratio_milli"),
        expr("CAST(floor(1000.0 * ln(CAST(wy AS DOUBLE)" +
          " / CAST(wx AS DOUBLE))) AS BIGINT)").as("log_wr_milli"))
  }

  /** Mood's median test: split both samples at the grand lower
    * median, one 2×2 chi-square double step. */
  def q1067: Q = Q(
    "q1067_mood_median",
    Some(s"""
      |WITH ${sqlH},
      |cum AS (SELECT v, cx, cy,
      |               sum(cx + cy) OVER (ORDER BY v) AS cc
      |        FROM h),
      |med AS (SELECT min(v) AS mv FROM cum CROSS JOIN mo
      |        WHERE cc * 2 >= mo.nx + mo.ny),
      |sp AS (SELECT sum(CASE WHEN v > med.mv THEN cx ELSE 0 END) AS a,
      |              sum(CASE WHEN v > med.mv THEN cy ELSE 0 END) AS b,
      |              sum(CASE WHEN v <= med.mv THEN cx ELSE 0 END) AS c,
      |              sum(CASE WHEN v <= med.mv THEN cy ELSE 0 END) AS d
      |       FROM h CROSS JOIN med)
      |SELECT (SELECT mv FROM med) AS median_value,
      |       CAST(a AS BIGINT) AS kept_above,
      |       CAST(b AS BIGINT) AS returned_above,
      |       CAST(c AS BIGINT) AS kept_below_eq,
      |       CAST(d AS BIGINT) AS returned_below_eq,
      |       CAST(floor(1000.0 * CAST(a + b + c + d AS DOUBLE)
      |            * (CAST(a AS DOUBLE) * d - CAST(b AS DOUBLE) * c)
      |            * (CAST(a AS DOUBLE) * d - CAST(b AS DOUBLE) * c)
      |            / (CAST(a + b AS DOUBLE) * (c + d) * (a + c)
      |               * (b + d))) AS BIGINT) AS chi2_milli
      |FROM sp
      |""".stripMargin)) { (s, dir) =>
    val h = QtyHistogram.table(s, dir)
    val cum = h.select(col("v"), col("cx"), col("cy"),
      sum(col("cx") + col("cy")).over(Window.orderBy(col("v"))).as("cc"))
    val mo = h.agg(sum(col("cx")).as("nx"), sum(col("cy")).as("ny"))
    val med = cum.crossJoin(broadcast(mo))
      .where(col("cc") * 2 >= col("nx") + col("ny"))
      .agg(min(col("v")).as("mv"))
    h.crossJoin(broadcast(med))
      .agg(first(col("mv")).as("median_value"),
        sum(when(col("v") > col("mv"), col("cx")).otherwise(0L)).as("a"),
        sum(when(col("v") > col("mv"), col("cy")).otherwise(0L)).as("b"),
        sum(when(col("v") <= col("mv"), col("cx")).otherwise(0L)).as("c"),
        sum(when(col("v") <= col("mv"), col("cy")).otherwise(0L)).as("d"))
      .select(col("median_value"),
        col("a").cast("long").as("kept_above"),
        col("b").cast("long").as("returned_above"),
        col("c").cast("long").as("kept_below_eq"),
        col("d").cast("long").as("returned_below_eq"),
        expr("CAST(floor(1000.0 * CAST(a + b + c + d AS DOUBLE)" +
          " * (CAST(a AS DOUBLE) * d - CAST(b AS DOUBLE) * c)" +
          " * (CAST(a AS DOUBLE) * d - CAST(b AS DOUBLE) * c)" +
          " / (CAST(a + b AS DOUBLE) * (c + d) * (a + c)" +
          " * (b + d))) AS BIGINT)").as("chi2_milli"))
  }

  /** G-test of independence, return-flag × line-status: 2·Σ O·ln(O·N
    * /(R·C)) with per-cell quantized terms. */
  def q1068: Q = Q(
    "q1068_gtest_independence",
    Some("""
      |WITH ct AS (SELECT l_returnflag AS rf, l_linestatus AS ls,
      |                   count(*) AS o
      |            FROM lineitem GROUP BY 1, 2),
      |rt AS (SELECT rf, sum(o) AS r FROM ct GROUP BY 1),
      |st AS (SELECT ls, sum(o) AS c FROM ct GROUP BY 1),
      |nn AS (SELECT sum(o) AS n FROM ct),
      |tm AS (SELECT ct.o,
      |              CAST(ct.o * ln((CAST(ct.o AS DOUBLE) * nn.n)
      |                   / (CAST(rt.r AS DOUBLE) * st.c))
      |                   AS DECIMAL(28,6)) AS term
      |       FROM ct JOIN rt ON rt.rf = ct.rf
      |       JOIN st ON st.ls = ct.ls CROSS JOIN nn),
      |dims AS (SELECT (SELECT count(*) FROM rt) AS nr,
      |                (SELECT count(*) FROM st) AS nc)
      |SELECT CAST((SELECT n FROM nn) AS BIGINT) AS n_items,
      |       CAST(floor(1000.0 * 2 * CAST(sum(term) AS DOUBLE))
      |            AS BIGINT) AS g_milli,
      |       CAST((SELECT (nr - 1) * (nc - 1) FROM dims) AS BIGINT)
      |         AS df
      |FROM tm
      |""".stripMargin)) { (s, dir) =>
    val ct = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag").as("rf"),
        col("l_linestatus").as("ls"))
      .agg(count(lit(1)).as("o"))
    val rt = ct.groupBy(col("rf")).agg(sum(col("o")).as("r"))
    val st = ct.groupBy(col("ls")).agg(sum(col("o")).as("c"))
    val nn = ct.agg(sum(col("o")).as("n"))
    val dims = rt.agg(count(lit(1)).as("nr"))
      .crossJoin(broadcast(st.agg(count(lit(1)).as("nc"))))
    ct.join(broadcast(rt), "rf").join(broadcast(st), "ls")
      .crossJoin(broadcast(nn))
      .select(expr("CAST(o * ln((CAST(o AS DOUBLE) * n)" +
        " / (CAST(r AS DOUBLE) * c)) AS DECIMAL(28,6))").as("term"),
        col("n"))
      .agg(first(col("n")).cast("long").as("n_items"),
        expr("CAST(floor(1000.0 * 2 * CAST(sum(term) AS DOUBLE))" +
          " AS BIGINT)").as("g_milli"))
      .crossJoin(broadcast(dims))
      .select(col("n_items"), col("g_milli"),
        expr("CAST((nr - 1) * (nc - 1) AS BIGINT)").as("df"))
  }

  /** Distance panel between the kept and returned quantity
    * distributions: integer-rational TV, quantized Hellinger /
    * Bhattacharyya. */
  def q1069: Q = Q(
    "q1069_quantity_distances",
    Some(s"""
      |WITH ${sqlH},
      |tm AS (SELECT abs(CAST(cx AS HUGEINT) * mo.ny
      |                  - CAST(cy AS HUGEINT) * mo.nx) AS num,
      |              CAST(sqrt((CAST(cx AS DOUBLE) / mo.nx)
      |                      * (CAST(cy AS DOUBLE) / mo.ny))
      |                   AS DECIMAL(28,9)) AS bc
      |       FROM h CROSS JOIN mo)
      |SELECT CAST((1000000 * sum(num))
      |            // (2 * CAST(mo.nx AS HUGEINT) * mo.ny) AS BIGINT)
      |         AS tv_micro,
      |       CAST(floor(1000000.0
      |            * sqrt(1 - least(CAST(sum(bc) AS DOUBLE), 1)))
      |            AS BIGINT) AS hellinger_micro,
      |       CAST(floor(1000000.0 * (-ln(CAST(sum(bc) AS DOUBLE))))
      |            AS BIGINT) AS bhattacharyya_micro
      |FROM tm CROSS JOIN mo GROUP BY mo.nx, mo.ny
      |""".stripMargin)) { (s, dir) =>
    val h = QtyHistogram.table(s, dir)
    val mo = h.agg(sum(col("cx")).as("nx"), sum(col("cy")).as("ny"))
    h.crossJoin(broadcast(mo))
      .select(expr("abs(CAST(cx AS DECIMAL(38,0)) * ny" +
        " - CAST(cy AS DECIMAL(38,0)) * nx)").as("num"),
        expr("CAST(sqrt((CAST(cx AS DOUBLE) / nx)" +
          " * (CAST(cy AS DOUBLE) / ny)) AS DECIMAL(28,9))").as("bc"),
        col("nx"), col("ny"))
      .groupBy(col("nx"), col("ny"))
      .agg(sum(col("num")).as("snum"), sum(col("bc")).as("sbc"))
      .select(expr("CAST((1000000 * snum)" +
        " div (2 * CAST(nx AS DECIMAL(38,0)) * ny) AS BIGINT)")
        .as("tv_micro"),
        expr("CAST(floor(1000000.0" +
          " * sqrt(1 - least(CAST(sbc AS DOUBLE), 1))) AS BIGINT)")
          .as("hellinger_micro"),
        expr("CAST(floor(1000000.0 * (-ln(CAST(sbc AS DOUBLE))))" +
          " AS BIGINT)").as("bhattacharyya_micro"))
  }

  /** Overlap coefficient (exact rational Σ min(p, q)) plus the modal
    * value of each sample. */
  def q1070: Q = Q(
    "q1070_overlap_coefficient",
    Some(s"""
      |WITH ${sqlH},
      |tm AS (SELECT v, cx, cy,
      |              least(CAST(cx AS HUGEINT) * mo.ny,
      |                    CAST(cy AS HUGEINT) * mo.nx) AS mn
      |       FROM h CROSS JOIN mo)
      |SELECT CAST((1000000 * sum(mn))
      |            // (CAST(mo.nx AS HUGEINT) * mo.ny) AS BIGINT)
      |         AS ovl_ppm,
      |       CAST(sum(CASE WHEN cx > 0 AND cy > 0 THEN 1 ELSE 0 END)
      |            AS BIGINT) AS n_common_values,
      |       CAST(min_by(v, v - 100 * cx) AS BIGINT) AS mode_kept,
      |       CAST(min_by(v, v - 100 * cy) AS BIGINT) AS mode_returned
      |FROM tm CROSS JOIN mo GROUP BY mo.nx, mo.ny
      |""".stripMargin)) { (s, dir) =>
    val h = QtyHistogram.table(s, dir)
    val mo = h.agg(sum(col("cx")).as("nx"), sum(col("cy")).as("ny"))
    h.crossJoin(broadcast(mo))
      .select(col("v"), col("cx"), col("cy"), col("nx"), col("ny"),
        least(expr("CAST(cx AS DECIMAL(38,0)) * ny"),
          expr("CAST(cy AS DECIMAL(38,0)) * nx")).as("mn"))
      .groupBy(col("nx"), col("ny"))
      .agg(sum(col("mn")).as("smn"),
        sum(when(col("cx") > 0 && col("cy") > 0, 1L).otherwise(0L))
          .as("n_common_values"),
        min_by(col("v"), col("v") - lit(100L) * col("cx"))
          .as("mode_kept"),
        min_by(col("v"), col("v") - lit(100L) * col("cy"))
          .as("mode_returned"))
      .select(expr("CAST((1000000 * smn)" +
        " div (CAST(nx AS DECIMAL(38,0)) * ny) AS BIGINT)")
        .as("ovl_ppm"),
        col("n_common_values"),
        col("mode_kept").cast("long").as("mode_kept"),
        col("mode_returned").cast("long").as("mode_returned"))
  }
}
