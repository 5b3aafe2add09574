package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables

/** Round-9 ANOVA-completion wave on order values (cents) by customer
  * REGION and order QUARTER: the two-way cell-means decomposition,
  * Welch's heteroscedastic one-way ANOVA, Scheffé pairwise contrast
  * statistics, the η²/partial-η²/ω² effect-size ladder, and exact
  * integer orthogonal-polynomial trend contrasts over quarters —
  * extending the shipped one-way battery (q363 norm ANOVA, q486
  * Tukey, q615 Bartlett, q628 Yuen). One fact pass builds the
  * region×quarter cell moments (5×28 dim); every SS term T²/n is
  * milli-quantized PER CELL/GROUP before any sum, and the orthogonal
  * contrasts use the closed-form INTEGER coefficient families
  * 2k−m−1 / 3d²−(m²−1) / 5d³−(3m²−7)d. */
object AnovaQueries {

  val all: Seq[Q] = Seq(q776, q777, q778, q779, q780)

  /** Oracle CTE `cl(r, q, n, s, ss)` — cell count, cent sum, cent
    * sum of squares per region×quarter. */
  private def sqlCells: String = """
    |ov AS (
    |  SELECT rg.r_regionkey AS r,
    |         year(o.o_orderdate) * 4
    |           + (month(o.o_orderdate) - 1) // 3 AS q,
    |         CAST(o.o_totalprice * 100 AS BIGINT) AS v
    |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    |       JOIN nation n ON n.n_nationkey = c.c_nationkey
    |       JOIN region rg ON rg.r_regionkey = n.n_regionkey),
    |cl AS (
    |  SELECT r, q, count(*) AS n, sum(v) AS s,
    |         sum(CAST(v AS HUGEINT) * v) AS ss
    |  FROM ov GROUP BY 1, 2)""".stripMargin

  private def cells(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir),
        col("c_custkey") === col("o_custkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("n_nationkey") === col("c_nationkey"))
      .join(broadcast(Tables.region(s, dir)),
        col("r_regionkey") === col("n_regionkey"))
      .select(col("r_regionkey").as("r"),
        (year(col("o_orderdate")) * 4
          + expr("(month(o_orderdate) - 1) div 3")).as("q"),
        col("o_totalprice").multiply(100).cast("decimal(38,0)")
          .cast("long").as("v"))
      .groupBy(col("r"), col("q"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
        sum(col("v").cast("decimal(38,0)") * col("v")).as("ss"))

  /** Milli-quantized T²/n term. The Spark twin CANNOT use `div` (its
    * LONG result overflows on cents² sums); (a − a%n)/n is the exact
    * truncating division in pure decimal arithmetic — the remainder
    * subtraction makes the quotient an exact integer, so the decimal
    * division's scale rounding is a no-op. */
  private def tq(t: String, n: String): String =
    s"(1000 * CAST($t AS HUGEINT) * $t) // $n"
  private def tqS(t: String, n: String): String =
    s"CAST(((1000 * CAST($t AS DECIMAL(38,0)) * $t)" +
      s" - (1000 * CAST($t AS DECIMAL(38,0)) * $t) % $n) / $n" +
      s" AS DECIMAL(38,0))"

  /** Two-way cell-means ANOVA (unbalanced, cell-means contract): SS
    * for region, quarter, interaction (SS_cells − SS_A − SS_B) and
    * error, each ×1000 exact, with the interaction F as the one
    * pinned double. */
  def q776: Q = Q(
    "q776_two_way_anova",
    Some(s"""
      |WITH ${sqlCells},
      |gt AS (SELECT sum(n) AS nn, sum(s) AS ts, sum(ss) AS tss,
      |              count(*) AS ncells,
      |              count(DISTINCT r) AS na, count(DISTINCT q) AS nb
      |       FROM cl),
      |ta AS (SELECT sum(${tq("sa", "na2")}) AS ssa3 FROM (
      |  SELECT sum(s) AS sa, sum(n) AS na2 FROM cl GROUP BY r) z),
      |tb AS (SELECT sum(${tq("sb", "nb2")}) AS ssb3 FROM (
      |  SELECT sum(s) AS sb, sum(n) AS nb2 FROM cl GROUP BY q) z),
      |tc AS (SELECT sum(${tq("s", "n")}) AS ssc3 FROM cl)
      |SELECT CAST(gt.nn AS BIGINT) AS n_orders,
      |       CAST((ta.ssa3 - ${tq("gt.ts", "gt.nn")}) // 10000000
      |            AS BIGINT) AS ss_region_dollars2,
      |       CAST((tb.ssb3 - ${tq("gt.ts", "gt.nn")}) // 10000000
      |            AS BIGINT) AS ss_quarter_dollars2,
      |       CAST((tc.ssc3 - ta.ssa3 - tb.ssb3
      |            + ${tq("gt.ts", "gt.nn")}) // 10000000 AS BIGINT)
      |         AS ss_interaction_dollars2,
      |       CAST((1000 * gt.tss - tc.ssc3) // 10000000 AS BIGINT)
      |         AS ss_error_dollars2,
      |       CAST(floor(
      |         (CAST(tc.ssc3 - ta.ssa3 - tb.ssb3
      |               + ${tq("gt.ts", "gt.nn")} AS DOUBLE)
      |          / ((gt.na - 1) * (gt.nb - 1)))
      |         / (CAST(1000 * gt.tss - tc.ssc3 AS DOUBLE)
      |            / (gt.nn - gt.ncells)) * 1000.0) AS BIGINT)
      |         AS f_interaction_milli
      |FROM gt CROSS JOIN ta CROSS JOIN tb CROSS JOIN tc
      |""".stripMargin)) { (s, dir) =>
    val cl = cells(s, dir).materialize()
    val gt = cl.agg(sum(col("n")).as("nn"), sum(col("s")).as("ts"),
      sum(col("ss")).as("tss"), count(lit(1)).as("ncells"),
      countDistinct(col("r")).as("na"),
      countDistinct(col("q")).as("nb"))
    val ta = cl.groupBy(col("r"))
      .agg(sum(col("s")).as("sa"), sum(col("n")).as("na2"))
      .agg(sum(expr(tqS("sa", "na2"))).as("ssa3"))
    val tb = cl.groupBy(col("q"))
      .agg(sum(col("s")).as("sb"), sum(col("n")).as("nb2"))
      .agg(sum(expr(tqS("sb", "nb2"))).as("ssb3"))
    val tc = cl.agg(sum(expr(tqS("s", "n"))).as("ssc3"))
    gt.crossJoin(broadcast(ta)).crossJoin(broadcast(tb))
      .crossJoin(broadcast(tc))
      .select(col("nn").cast("long").as("n_orders"),
        expr(s"CAST((ssa3 - ${tqS("ts", "nn")}) div 10000000" +
          " AS BIGINT)").as("ss_region_dollars2"),
        expr(s"CAST((ssb3 - ${tqS("ts", "nn")}) div 10000000" +
          " AS BIGINT)").as("ss_quarter_dollars2"),
        expr(s"CAST((ssc3 - ssa3 - ssb3 + ${tqS("ts", "nn")})" +
          " div 10000000 AS BIGINT)").as("ss_interaction_dollars2"),
        expr("CAST((1000 * tss - ssc3) div 10000000 AS BIGINT)")
          .as("ss_error_dollars2"),
        expr(s"""CAST(floor(
          | (CAST(ssc3 - ssa3 - ssb3 + ${tqS("ts", "nn")} AS DOUBLE)
          |  / ((na - 1) * (nb - 1)))
          | / (CAST(1000 * tss - ssc3 AS DOUBLE)
          |    / (nn - ncells)) * 1000.0) AS BIGINT)""".stripMargin)
          .as("f_interaction_milli"))
  }

  /** Welch's heteroscedastic one-way ANOVA across the 5 regions:
    * weights w = n/s², W statistic and Welch–Satterthwaite df — the
    * unequal-variance-honest region comparison. Group moments exact;
    * the statistic one pinned-double pipeline over the 5-row dim with
    * per-group terms computed identically. */
  def q777: Q = Q(
    "q777_welch_anova",
    Some(s"""
      |WITH ${sqlCells},
      |gr AS (
      |  SELECT r, sum(n) AS n, sum(s) AS s, sum(ss) AS ss FROM cl
      |  GROUP BY 1),
      |gm AS (
      |  SELECT r, n,
      |         CAST(s AS DOUBLE) / n AS mean,
      |         (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
      |           / (n - 1) AS var
      |  FROM gr),
      |ww AS (
      |  SELECT count(*) AS k, sum(CAST(n AS DOUBLE) / var) AS sw,
      |         sum(CAST(n AS DOUBLE) / var * mean) AS swm
      |  FROM gm),
      |nm AS (
      |  SELECT gm.r, gm.n, gm.mean, gm.var,
      |         CAST(gm.n AS DOUBLE) / gm.var AS w,
      |         ww.sw, ww.swm, ww.k
      |  FROM gm CROSS JOIN ww),
      |st AS (
      |  SELECT max(k) AS k,
      |         sum(w * (mean - swm / sw) * (mean - swm / sw))
      |           / (max(k) - 1) AS num,
      |         sum((1.0 - w / sw) * (1.0 - w / sw) / (n - 1)) AS hsum
      |  FROM nm)
      |SELECT CAST(k AS BIGINT) AS n_groups,
      |       CAST(floor(num / (1.0 + 2.0 * (k - 2) / (k * k - 1.0)
      |            * hsum) * 1000.0) AS BIGINT) AS welch_w_milli,
      |       CAST(floor((k * k - 1.0) / (3.0 * hsum) * 1000.0)
      |            AS BIGINT) AS welch_df2_milli
      |FROM st
      |""".stripMargin)) { (s, dir) =>
    val gr = cells(s, dir).groupBy(col("r"))
      .agg(sum(col("n")).as("n"), sum(col("s")).as("s"),
        sum(col("ss")).as("ss"))
    val gm = gr.select(col("r"), col("n"),
        expr("CAST(s AS DOUBLE) / n").as("mean"),
        expr("(CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n)" +
          " / (n - 1)").as("var"))
      .materialize()
    val ww = gm.agg(count(lit(1)).as("k"),
      sum(expr("CAST(n AS DOUBLE) / var")).as("sw"),
      sum(expr("CAST(n AS DOUBLE) / var * mean")).as("swm"))
    val st = gm.crossJoin(broadcast(ww))
      .select(col("k"), col("n"), col("mean"), col("var"),
        expr("CAST(n AS DOUBLE) / var").as("w"), col("sw"), col("swm"))
      .agg(max(col("k")).as("k"),
        (sum(expr("w * (mean - swm / sw) * (mean - swm / sw)"))
          / (max(col("k")) - 1)).as("num"),
        sum(expr("(1.0 - w / sw) * (1.0 - w / sw) / (n - 1)"))
          .as("hsum"))
    st.select(col("k").cast("long").as("n_groups"),
      expr("CAST(floor(num / (1.0 + 2.0 * (k - 2) / (k * k - 1.0)" +
        " * hsum) * 1000.0) AS BIGINT)").as("welch_w_milli"),
      expr("CAST(floor((k * k - 1.0) / (3.0 * hsum) * 1000.0)" +
        " AS BIGINT)").as("welch_df2_milli"))
  }

  /** Scheffé pairwise contrast statistics: S² = (x̄_i−x̄_j)² /
    * (MSE·(1/n_i+1/n_j)·(k−1)) for all 10 region pairs — compare to
    * any F quantile downstream; the simultaneous-inference sibling of
    * the shipped Tukey HSD (q486). */
  def q778: Q = Q(
    "q778_scheffe_contrasts",
    Some(s"""
      |WITH ${sqlCells},
      |gr AS (
      |  SELECT r, sum(n) AS n, sum(s) AS s, sum(ss) AS ss FROM cl
      |  GROUP BY 1),
      |mse AS (
      |  SELECT count(*) AS k, sum(n) AS nn,
      |         sum(CAST(ss AS DOUBLE)
      |             - CAST(s AS DOUBLE) * s / n) AS sse
      |  FROM gr)
      |SELECT CAST(a.r AS BIGINT) AS region_a,
      |       CAST(b.r AS BIGINT) AS region_b,
      |       CAST(floor((CAST(a.s AS DOUBLE) / a.n
      |              - CAST(b.s AS DOUBLE) / b.n) / 100.0) AS BIGINT)
      |         AS mean_gap_dollars,
      |       CAST(floor(
      |         (CAST(a.s AS DOUBLE) / a.n - CAST(b.s AS DOUBLE) / b.n)
      |         * (CAST(a.s AS DOUBLE) / a.n - CAST(b.s AS DOUBLE) / b.n)
      |         / ((mse.sse / (mse.nn - mse.k))
      |            * (1.0 / a.n + 1.0 / b.n) * (mse.k - 1)) * 1000.0)
      |         AS BIGINT) AS scheffe_s2_milli
      |FROM gr a JOIN gr b ON a.r < b.r CROSS JOIN mse
      |ORDER BY region_a, region_b
      |""".stripMargin)) { (s, dir) =>
    val gr = cells(s, dir).groupBy(col("r"))
      .agg(sum(col("n")).as("n"), sum(col("s")).as("s"),
        sum(col("ss")).as("ss"))
      .materialize()
    val mse = gr.agg(count(lit(1)).as("k"), sum(col("n")).as("nn"),
      sum(expr("CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n"))
        .as("sse"))
    val a = gr.select(col("r").as("ra"), col("n").as("na"),
      col("s").as("sa"))
    val b = gr.select(col("r").as("rb"), col("n").as("nb"),
      col("s").as("sb"))
    a.join(b, col("ra") < col("rb")).crossJoin(broadcast(mse))
      .select(col("ra").cast("long").as("region_a"),
        col("rb").cast("long").as("region_b"),
        expr("CAST(floor((CAST(sa AS DOUBLE) / na" +
          " - CAST(sb AS DOUBLE) / nb) / 100.0) AS BIGINT)")
          .as("mean_gap_dollars"),
        expr("CAST(floor(" +
          "(CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb)" +
          " * (CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb)" +
          " / ((sse / (nn - k))" +
          " * (1.0 / na + 1.0 / nb) * (k - 1)) * 1000.0)" +
          " AS BIGINT)").as("scheffe_s2_milli"))
      .orderBy(col("region_a"), col("region_b"))
  }

  /** Effect sizes for the one-way region ANOVA: η² = SSA/SST,
    * partial η² (= η² one-way), and the bias-corrected
    * ω² = (SSA − (k−1)MSE)/(SST + MSE) — the "is the significant F
    * actually big" ladder, micro-quantized. */
  def q779: Q = Q(
    "q779_anova_effect_sizes",
    Some(s"""
      |WITH ${sqlCells},
      |gr AS (
      |  SELECT r, sum(n) AS n, sum(s) AS s, sum(ss) AS ss FROM cl
      |  GROUP BY 1),
      |tt AS (
      |  SELECT count(*) AS k, sum(n) AS nn, sum(s) AS ts,
      |         sum(ss) AS tss,
      |         sum(CAST(s AS DOUBLE) * s / n) AS sga
      |  FROM gr),
      |sx AS (
      |  SELECT k, nn,
      |         sga - CAST(ts AS DOUBLE) * ts / nn AS ssa,
      |         CAST(tss AS DOUBLE) - CAST(ts AS DOUBLE) * ts / nn
      |           AS sst,
      |         (CAST(tss AS DOUBLE) - sga) / (nn - k) AS mse
      |  FROM tt)
      |SELECT CAST(k AS BIGINT) AS n_groups,
      |       CAST(floor(ssa / sst * 1000000.0) AS BIGINT)
      |         AS eta2_micro,
      |       CAST(floor((ssa - (k - 1) * mse) / (sst + mse)
      |            * 1000000.0) AS BIGINT) AS omega2_micro,
      |       CAST(floor((ssa / (k - 1)) / mse * 1000.0) AS BIGINT)
      |         AS f_milli
      |FROM sx
      |""".stripMargin)) { (s, dir) =>
    cells(s, dir).groupBy(col("r"))
      .agg(sum(col("n")).as("n"), sum(col("s")).as("s"),
        sum(col("ss")).as("ss"))
      .agg(count(lit(1)).as("k"), sum(col("n")).as("nn"),
        sum(col("s")).as("ts"), sum(col("ss")).as("tss"),
        sum(expr("CAST(s AS DOUBLE) * s / n")).as("sga"))
      .select(col("k"), col("nn"),
        expr("sga - CAST(ts AS DOUBLE) * ts / nn").as("ssa"),
        expr("CAST(tss AS DOUBLE) - CAST(ts AS DOUBLE) * ts / nn")
          .as("sst"),
        expr("(CAST(tss AS DOUBLE) - sga) / (nn - k)").as("mse"))
      .select(col("k").cast("long").as("n_groups"),
        expr("CAST(floor(ssa / sst * 1000000.0) AS BIGINT)")
          .as("eta2_micro"),
        expr("CAST(floor((ssa - (k - 1) * mse) / (sst + mse)" +
          " * 1000000.0) AS BIGINT)").as("omega2_micro"),
        expr("CAST(floor((ssa / (k - 1)) / mse * 1000.0) AS BIGINT)")
          .as("f_milli"))
  }

  /** Orthogonal polynomial trend contrasts over the m quarters
    * (quarter mean value, milli-cent truncated): exact INTEGER
    * coefficient families d = 2k−m−1, 3d²−(m²−1), 5d³−(3m²−7)d —
    * the contrast sums are exact integers; reports each contrast's
    * share of the between-quarter spread. */
  def q780: Q = Q(
    "q780_poly_trend_contrasts",
    Some(s"""
      |WITH ${sqlCells},
      |qm AS (
      |  SELECT q, row_number() OVER (ORDER BY q) AS k,
      |         count(*) OVER () AS m,
      |         (1000 * sum(s)) // sum(n) AS mu
      |  FROM cl GROUP BY q),
      |cf AS (
      |  SELECT k, m, mu, 2 * k - m - 1 AS d FROM qm),
      |ct AS (
      |  SELECT max(m) AS m,
      |         sum(CAST(d AS HUGEINT) * mu) AS l1,
      |         sum((3 * CAST(d AS HUGEINT) * d - (CAST(m AS HUGEINT)
      |               * m - 1)) * mu) AS l2,
      |         sum((5 * CAST(d AS HUGEINT) * d * d
      |              - (3 * CAST(m AS HUGEINT) * m - 7) * d) * mu) AS l3,
      |         sum(CAST(d AS HUGEINT) * d) AS c1,
      |         sum((3 * CAST(d AS HUGEINT) * d - (CAST(m AS HUGEINT)
      |               * m - 1))
      |             * (3 * CAST(d AS HUGEINT) * d - (CAST(m AS HUGEINT)
      |               * m - 1))) AS c2,
      |         sum((5 * CAST(d AS HUGEINT) * d * d
      |              - (3 * CAST(m AS HUGEINT) * m - 7) * d)
      |             * (5 * CAST(d AS HUGEINT) * d * d
      |              - (3 * CAST(m AS HUGEINT) * m - 7) * d)) AS c3
      |  FROM cf)
      |SELECT CAST(m AS BIGINT) AS n_quarters,
      |       CAST(l1 // c1 AS BIGINT) AS linear_norm_millicents,
      |       CAST(l2 // c2 AS BIGINT) AS quad_norm_millicents,
      |       CAST(l3 // c3 AS BIGINT) AS cubic_norm_millicents
      |FROM ct
      |""".stripMargin)) { (s, dir) =>
    val w = org.apache.spark.sql.expressions.Window
    val qm = cells(s, dir).groupBy(col("q"))
      .agg(expr("(1000 * sum(s)) div sum(n)").as("mu"))
      .withColumn("k", row_number().over(w.orderBy(col("q"))))
      .withColumn("m", count(lit(1)).over(w.partitionBy(lit(1))))
      .select(col("k"), col("m"), col("mu"),
        (lit(2) * col("k") - col("m") - 1).as("d"))
    qm.agg(max(col("m")).as("m"),
        sum(col("d").cast("decimal(38,0)") * col("mu")).as("l1"),
        sum((lit(3) * col("d").cast("decimal(38,0)") * col("d")
          - (col("m").cast("decimal(38,0)") * col("m") - 1))
          * col("mu")).as("l2"),
        sum((lit(5) * col("d").cast("decimal(38,0)") * col("d")
          * col("d")
          - (lit(3) * col("m").cast("decimal(38,0)") * col("m") - 7)
            * col("d")) * col("mu")).as("l3"),
        sum(col("d").cast("decimal(38,0)") * col("d")).as("c1"),
        sum((lit(3) * col("d").cast("decimal(38,0)") * col("d")
          - (col("m").cast("decimal(38,0)") * col("m") - 1))
          * (lit(3) * col("d").cast("decimal(38,0)") * col("d")
          - (col("m").cast("decimal(38,0)") * col("m") - 1))).as("c2"),
        sum((lit(5) * col("d").cast("decimal(38,0)") * col("d")
          * col("d")
          - (lit(3) * col("m").cast("decimal(38,0)") * col("m") - 7)
            * col("d"))
          * (lit(5) * col("d").cast("decimal(38,0)") * col("d")
          * col("d")
          - (lit(3) * col("m").cast("decimal(38,0)") * col("m") - 7)
            * col("d"))).as("c3"))
      .select(col("m").cast("long").as("n_quarters"),
        expr("CAST(l1 div c1 AS BIGINT)").as("linear_norm_millicents"),
        expr("CAST(l2 div c2 AS BIGINT)").as("quad_norm_millicents"),
        expr("CAST(l3 div c3 AS BIGINT)").as("cubic_norm_millicents"))
  }
}
