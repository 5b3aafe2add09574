package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables

/** Round-9 model-evaluation statistics wave on the q516 shared
  * predictor (per-discount-level return rates learned ≤1997 scoring
  * 1998+): DeLong's AUC standard error, partial AUC at FPR ≤ 0.2,
  * Spiegelhalter's calibration Z, the Brier skill score vs
  * climatology, and the net reclassification improvement against a
  * quantity-bucket challenger model. The eval half reduces to the
  * (score level → positives/negatives) histogram (≤11 levels), so
  * every pair statistic is exact integer algebra on that dim —
  * DeLong's variance components via the scaled identity
  * (P·v10 − A2)², the ROC segments quantized per segment, never a
  * row-pair join. */
object EvalStatQueries {

  val all: Seq[Q] = Seq(q741, q742, q743, q744, q745)

  /** q516's shared oracle CTEs (same text): train rates per discount
    * level, eval rows ≥1998. */
  private def sqlBase: String =
    """l AS (
      |  SELECT CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS b,
      |         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
      |         year(l_shipdate) AS yr,
      |         CAST(l_quantity AS BIGINT) AS q
      |  FROM lineitem),
      |tr AS (SELECT b, (1000 * sum(y)) // count(*) AS p
      |       FROM l WHERE yr <= 1997 GROUP BY 1),
      |ev AS (
      |  SELECT l.b, tr.p, l.y, l.q
      |  FROM l JOIN tr ON l.b = tr.b WHERE l.yr >= 1998)""".stripMargin

  /** Score-level histogram CTE `sl(p, npos, nneg)` + totals
    * `tt(pp, nn)`. */
  private def sqlLevels: String = sqlBase + """,
    |sl AS (
    |  SELECT p, sum(y) AS npos, sum(1 - y) AS nneg
    |  FROM ev GROUP BY 1),
    |tt AS (SELECT sum(npos) AS pp, sum(nneg) AS nn FROM sl)""".stripMargin

  private def evalRows(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
      .select(expr("CAST(floor(l_discount * 100 + 0.5) AS BIGINT)")
          .as("b"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"),
        year(col("l_shipdate")).as("yr"),
        col("l_quantity").cast("long").as("q"))
      .materialize()
    val tr = l.where(col("yr") <= 1997).groupBy(col("b"))
      .agg(expr("(1000 * sum(y)) div count(1)").as("p"))
    l.where(col("yr") >= 1998)
      .join(broadcast(tr.withColumnRenamed("b", "tb")),
        col("b") === col("tb"))
      .select(col("b"), col("p"), col("y"), col("q"))
  }

  /** Spark mirror of sl+tt: one ≤11-row frame with p, npos, nneg
    * plus broadcast totals pp, nn. */
  private def levels(s: SparkSession, dir: String): DataFrame = {
    val sl = evalRows(s, dir)
      .groupBy(col("p"))
      .agg(sum(col("y")).as("npos"), sum(lit(1L) - col("y")).as("nneg"))
      .materialize()
    val tt = sl.agg(sum(col("npos")).as("pp"), sum(col("nneg")).as("nn"))
    sl.crossJoin(broadcast(tt))
  }

  /** DeLong AUC standard error and 95% CI: tie-aware AUC from the
    * level histogram (A2 = Σ npos·(2·negBelow + negEq), units
    * 1/(2PN)) and the structural variance components via the exact
    * integer sums D10 = Σnpos(P·v10s − A2)², D01 = Σnneg(N·v01s −
    * A2)² — SE = √(D10/(P(P−1)) + D01/(N(N−1)))/(2PN), one pinned
    * double. */
  def q741: Q = Q(
    "q741_delong_auc_se",
    Some(s"""
      |WITH ${sqlLevels},
      |cm AS (
      |  SELECT p, npos, nneg,
      |         coalesce(sum(nneg) OVER (ORDER BY p
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |           0) AS negbelow,
      |         coalesce(sum(npos) OVER (ORDER BY p
      |           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING),
      |           0) AS posabove
      |  FROM sl),
      |a2 AS (
      |  SELECT sum(CAST(npos AS HUGEINT) * (2 * negbelow + nneg))
      |           AS a2
      |  FROM cm),
      |dd AS (
      |  SELECT sum(CAST(npos AS HUGEINT)
      |           * (tt.pp * CAST(2 * negbelow + nneg AS HUGEINT)
      |              - a2.a2)
      |           * (tt.pp * CAST(2 * negbelow + nneg AS HUGEINT)
      |              - a2.a2)) AS d10,
      |         sum(CAST(nneg AS HUGEINT)
      |           * (tt.nn * CAST(2 * posabove + npos AS HUGEINT)
      |              - a2.a2)
      |           * (tt.nn * CAST(2 * posabove + npos AS HUGEINT)
      |              - a2.a2)) AS d01,
      |         max(tt.pp) AS pp, max(tt.nn) AS nn, max(a2.a2) AS a2
      |  FROM cm CROSS JOIN tt CROSS JOIN a2)
      |SELECT CAST(pp AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
      |       CAST((1000000 * a2) // (2 * pp * nn) AS BIGINT)
      |         AS auc_micro,
      |       CAST(floor(sqrt(CAST(d10 AS DOUBLE)
      |              / (CAST(pp AS DOUBLE) * (pp - 1))
      |              + CAST(d01 AS DOUBLE)
      |                / (CAST(nn AS DOUBLE) * (nn - 1)))
      |            / (2.0 * CAST(pp AS DOUBLE) * CAST(nn AS DOUBLE))
      |            * 1000000.0) AS BIGINT) AS se_micro,
      |       CAST(floor((CAST(a2 AS DOUBLE)
      |              / (2.0 * CAST(pp AS DOUBLE) * CAST(nn AS DOUBLE))
      |            - 1.96 * sqrt(CAST(d10 AS DOUBLE)
      |                / (CAST(pp AS DOUBLE) * (pp - 1))
      |                + CAST(d01 AS DOUBLE)
      |                  / (CAST(nn AS DOUBLE) * (nn - 1)))
      |              / (2.0 * CAST(pp AS DOUBLE) * CAST(nn AS DOUBLE)))
      |            * 1000.0) AS BIGINT) AS ci_lo_milli,
      |       CAST(floor((CAST(a2 AS DOUBLE)
      |              / (2.0 * CAST(pp AS DOUBLE) * CAST(nn AS DOUBLE))
      |            + 1.96 * sqrt(CAST(d10 AS DOUBLE)
      |                / (CAST(pp AS DOUBLE) * (pp - 1))
      |                + CAST(d01 AS DOUBLE)
      |                  / (CAST(nn AS DOUBLE) * (nn - 1)))
      |              / (2.0 * CAST(pp AS DOUBLE) * CAST(nn AS DOUBLE)))
      |            * 1000.0) AS BIGINT) AS ci_hi_milli
      |FROM dd
      |""".stripMargin)) { (s, dir) =>
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("p"))
    val cm = levels(s, dir)
      .withColumn("negbelow", coalesce(sum(col("nneg")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("posabove", coalesce(sum(col("npos")).over(
        w.rowsBetween(1, org.apache.spark.sql.expressions.Window.unboundedFollowing)), lit(0L)))
      .materialize()
    val a2 = cm.agg(sum(col("npos").cast("decimal(38,0)")
      * (lit(2) * col("negbelow") + col("nneg"))).as("a2"))
    cm.crossJoin(broadcast(a2))
      .agg(
        sum(col("npos").cast("decimal(38,0)")
          * (col("pp") * (lit(2) * col("negbelow") + col("nneg"))
              .cast("decimal(38,0)") - col("a2"))
          * (col("pp") * (lit(2) * col("negbelow") + col("nneg"))
              .cast("decimal(38,0)") - col("a2"))).as("d10"),
        sum(col("nneg").cast("decimal(38,0)")
          * (col("nn") * (lit(2) * col("posabove") + col("npos"))
              .cast("decimal(38,0)") - col("a2"))
          * (col("nn") * (lit(2) * col("posabove") + col("npos"))
              .cast("decimal(38,0)") - col("a2"))).as("d01"),
        max(col("pp")).as("pp"), max(col("nn")).as("nn"),
        max(col("a2")).as("a2"))
      .select(col("pp").cast("long").as("n_pos"),
        col("nn").cast("long").as("n_neg"),
        expr("CAST((1000000 * a2) div (2 * pp * nn) AS BIGINT)")
          .as("auc_micro"),
        expr("CAST(floor(sqrt(CAST(d10 AS DOUBLE)" +
          " / (CAST(pp AS DOUBLE) * (pp - 1))" +
          " + CAST(d01 AS DOUBLE)" +
          " / (CAST(nn AS DOUBLE) * (nn - 1)))" +
          " / (2.0 * CAST(pp AS DOUBLE) * CAST(nn AS DOUBLE))" +
          " * 1000000.0) AS BIGINT)").as("se_micro"),
        expr("CAST(floor((CAST(a2 AS DOUBLE)" +
          " / (2.0 * CAST(pp AS DOUBLE) * CAST(nn AS DOUBLE))" +
          " - 1.96 * sqrt(CAST(d10 AS DOUBLE)" +
          " / (CAST(pp AS DOUBLE) * (pp - 1))" +
          " + CAST(d01 AS DOUBLE)" +
          " / (CAST(nn AS DOUBLE) * (nn - 1)))" +
          " / (2.0 * CAST(pp AS DOUBLE) * CAST(nn AS DOUBLE)))" +
          " * 1000.0) AS BIGINT)").as("ci_lo_milli"),
        expr("CAST(floor((CAST(a2 AS DOUBLE)" +
          " / (2.0 * CAST(pp AS DOUBLE) * CAST(nn AS DOUBLE))" +
          " + 1.96 * sqrt(CAST(d10 AS DOUBLE)" +
          " / (CAST(pp AS DOUBLE) * (pp - 1))" +
          " + CAST(d01 AS DOUBLE)" +
          " / (CAST(nn AS DOUBLE) * (nn - 1)))" +
          " / (2.0 * CAST(pp AS DOUBLE) * CAST(nn AS DOUBLE)))" +
          " * 1000.0) AS BIGINT)").as("ci_hi_milli"))
  }

  /** Partial AUC on FPR ∈ [0, 0.2]: walk the ROC level steps from the
    * highest score down; each full segment's trapezoid (and the one
    * interpolated crossing segment at FP = N/5) is computed from
    * exact cumulative counts and pico-quantized PER SEGMENT before the
    * sum. Reports pAUC and its share of the 0.2 ceiling. */
  def q742: Q = Q(
    "q742_partial_auc",
    Some(s"""
      |WITH ${sqlLevels},
      |st AS (
      |  SELECT p,
      |         sum(npos) OVER (ORDER BY p DESC) AS tp,
      |         sum(nneg) OVER (ORDER BY p DESC) AS fp,
      |         coalesce(sum(npos) OVER (ORDER BY p DESC
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |           0) AS tp0,
      |         coalesce(sum(nneg) OVER (ORDER BY p DESC
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |           0) AS fp0
      |  FROM sl),
      |sg AS (
      |  SELECT CAST(floor(
      |    CASE
      |      WHEN 5 * fp0 >= nn THEN 0.0
      |      WHEN 5 * fp <= nn THEN
      |        CAST(fp - fp0 AS DOUBLE) * (tp0 + tp)
      |        / (2.0 * CAST(pp AS DOUBLE) * nn)
      |      ELSE
      |        (CAST(nn AS DOUBLE) / 5.0 - fp0)
      |        * (CAST(tp0 AS DOUBLE)
      |           + (tp0 + CAST(tp - tp0 AS DOUBLE)
      |              * (CAST(nn AS DOUBLE) / 5.0 - fp0) / (fp - fp0)))
      |        / (2.0 * CAST(pp AS DOUBLE) * nn)
      |    END * 1000000000000.0) AS BIGINT) AS aq
      |  FROM st CROSS JOIN tt)
      |SELECT (SELECT CAST(pp AS BIGINT) FROM tt) AS n_pos,
      |       (SELECT CAST(nn AS BIGINT) FROM tt) AS n_neg,
      |       CAST(sum(aq) // 1000000 AS BIGINT) AS pauc_micro,
      |       CAST(sum(aq) * 5 // 1000000 AS BIGINT)
      |         AS pauc_share_micro
      |FROM sg
      |""".stripMargin)) { (s, dir) =>
    val wd = org.apache.spark.sql.expressions.Window
      .orderBy(col("p").desc)
    val st = levels(s, dir)
      .withColumn("tp", sum(col("npos")).over(wd))
      .withColumn("fp", sum(col("nneg")).over(wd))
      .withColumn("tp0", coalesce(sum(col("npos")).over(
        wd.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("fp0", coalesce(sum(col("nneg")).over(
        wd.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)), lit(0L)))
    st.select(col("pp"), col("nn"),
        expr("""CAST(floor(
          CASE
            WHEN 5 * fp0 >= nn THEN 0.0
            WHEN 5 * fp <= nn THEN
              CAST(fp - fp0 AS DOUBLE) * (tp0 + tp)
              / (2.0 * CAST(pp AS DOUBLE) * nn)
            ELSE
              (CAST(nn AS DOUBLE) / 5.0 - fp0)
              * (CAST(tp0 AS DOUBLE)
                 + (tp0 + CAST(tp - tp0 AS DOUBLE)
                    * (CAST(nn AS DOUBLE) / 5.0 - fp0) / (fp - fp0)))
              / (2.0 * CAST(pp AS DOUBLE) * nn)
          END * 1000000000000.0) AS BIGINT)""").as("aq"))
      .groupBy(col("pp"), col("nn"))
      .agg(sum(col("aq")).as("sa"))
      .select(col("pp").cast("long").as("n_pos"),
        col("nn").cast("long").as("n_neg"),
        expr("CAST(sa div 1000000 AS BIGINT)").as("pauc_micro"),
        expr("CAST(sa * 5 div 1000000 AS BIGINT)")
          .as("pauc_share_micro"))
  }

  /** Spiegelhalter's calibration Z: Σ(y−p̂)(1−2p̂)/√Σ(1−2p̂)²p̂(1−p̂)
    * — permille scales cancel exactly, so Z = num6/√den12 with both
    * sums exact integers over the level histogram. */
  def q743: Q = Q(
    "q743_spiegelhalter_z",
    Some(s"""
      |WITH ${sqlLevels},
      |ms AS (
      |  SELECT sum((CAST(npos AS HUGEINT) * (1000 - p)
      |              - CAST(nneg AS HUGEINT) * p) * (1000 - 2 * p))
      |           AS num6,
      |         sum(CAST(npos + nneg AS HUGEINT) * (1000 - 2 * p)
      |             * (1000 - 2 * p) * p * (1000 - p)) AS den12,
      |         sum(npos + nneg) AS n
      |  FROM sl)
      |SELECT CAST(n AS BIGINT) AS n_rows,
      |       CAST(num6 // 1000 AS BIGINT) AS raw_gap_milli,
      |       CAST(floor(CAST(num6 AS DOUBLE)
      |            / sqrt(CAST(den12 AS DOUBLE)) * 1000.0) AS BIGINT)
      |         AS z_milli
      |FROM ms
      |""".stripMargin)) { (s, dir) =>
    levels(s, dir)
      .agg(sum((col("npos").cast("decimal(38,0)") * (lit(1000) - col("p"))
          - col("nneg").cast("decimal(38,0)") * col("p"))
          * (lit(1000) - lit(2) * col("p"))).as("num6"),
        sum((col("npos") + col("nneg")).cast("decimal(38,0)")
          * (lit(1000) - lit(2) * col("p"))
          * (lit(1000) - lit(2) * col("p"))
          * col("p") * (lit(1000) - col("p"))).as("den12"),
        sum(col("npos") + col("nneg")).as("n"))
      .select(col("n").cast("long").as("n_rows"),
        expr("CAST(num6 div 1000 AS BIGINT)").as("raw_gap_milli"),
        expr("CAST(floor(CAST(num6 AS DOUBLE)" +
          " / sqrt(CAST(den12 AS DOUBLE)) * 1000.0) AS BIGINT)")
          .as("z_milli"))
  }

  /** Brier skill score vs climatology: BSS = 1 − BS/BS_ref with the
    * reference forecast the truncated-permille base rate — both
    * Brier sums exact integers (×10⁶). */
  def q744: Q = Q(
    "q744_brier_skill",
    Some(s"""
      |WITH ${sqlLevels},
      |bs AS (
      |  SELECT sum(CAST(npos AS HUGEINT) * (1000 - p) * (1000 - p)
      |             + CAST(nneg AS HUGEINT) * p * p) AS bs6,
      |         sum(npos) AS pp, sum(nneg) AS nn
      |  FROM sl),
      |rf AS (
      |  SELECT bs6, pp, nn, (1000 * pp) // (pp + nn) AS yb
      |  FROM bs)
      |SELECT CAST(pp + nn AS BIGINT) AS n_rows,
      |       CAST(bs6 // (pp + nn) AS BIGINT) AS brier_micro,
      |       CAST((CAST(pp AS HUGEINT) * (1000 - yb) * (1000 - yb)
      |             + CAST(nn AS HUGEINT) * yb * yb) // (pp + nn)
      |            AS BIGINT) AS brier_ref_micro,
      |       CAST((1000000 * ((CAST(pp AS HUGEINT) * (1000 - yb)
      |              * (1000 - yb) + CAST(nn AS HUGEINT) * yb * yb)
      |              - bs6))
      |            // (CAST(pp AS HUGEINT) * (1000 - yb) * (1000 - yb)
      |               + CAST(nn AS HUGEINT) * yb * yb) AS BIGINT)
      |         AS bss_micro
      |FROM rf
      |""".stripMargin)) { (s, dir) =>
    levels(s, dir)
      .agg(sum(col("npos").cast("decimal(38,0)")
          * (lit(1000) - col("p")) * (lit(1000) - col("p"))
          + col("nneg").cast("decimal(38,0)") * col("p") * col("p"))
          .as("bs6"),
        sum(col("npos")).as("pp"), sum(col("nneg")).as("nn"))
      .select(col("bs6"), col("pp"), col("nn"),
        expr("(1000 * pp) div (pp + nn)").as("yb"))
      .select(expr("CAST(pp + nn AS BIGINT)").as("n_rows"),
        expr("CAST(bs6 div (pp + nn) AS BIGINT)").as("brier_micro"),
        expr("CAST((CAST(pp AS DECIMAL(38,0)) * (1000 - yb)" +
          " * (1000 - yb) + CAST(nn AS DECIMAL(38,0)) * yb * yb)" +
          " div (pp + nn) AS BIGINT)").as("brier_ref_micro"),
        expr("CAST((1000000 * ((CAST(pp AS DECIMAL(38,0)) * (1000 - yb)" +
          " * (1000 - yb) + CAST(nn AS DECIMAL(38,0)) * yb * yb)" +
          " - bs6))" +
          " div (CAST(pp AS DECIMAL(38,0)) * (1000 - yb) * (1000 - yb)" +
          " + CAST(nn AS DECIMAL(38,0)) * yb * yb) AS BIGINT)")
          .as("bss_micro"))
  }

  /** Net reclassification improvement of a quantity-decile challenger
    * over the discount model: among events, P(challenger scores
    * higher) − P(lower); among non-events the reverse; NRI = the sum.
    * Both models are ≤1997-trained permille tables; the comparison is
    * a bounded (discount level × quantity decile) histogram. */
  def q745: Q = Q(
    "q745_nri_challenger",
    Some(s"""
      |WITH ${sqlBase},
      |tq AS (SELECT (q - 1) // 5 AS qb, (1000 * sum(y)) // count(*)
      |         AS pq
      |       FROM l WHERE yr <= 1997 GROUP BY 1),
      |ej AS (
      |  SELECT ev.y, ev.p, tq.pq
      |  FROM ev JOIN tq ON (ev.q - 1) // 5 = tq.qb),
      |ct AS (
      |  SELECT sum(CASE WHEN y = 1 AND pq > p THEN 1 ELSE 0 END)
      |           AS up_e,
      |         sum(CASE WHEN y = 1 AND pq < p THEN 1 ELSE 0 END)
      |           AS dn_e,
      |         sum(CASE WHEN y = 0 AND pq > p THEN 1 ELSE 0 END)
      |           AS up_n,
      |         sum(CASE WHEN y = 0 AND pq < p THEN 1 ELSE 0 END)
      |           AS dn_n,
      |         sum(y) AS pp, sum(1 - y) AS nn
      |  FROM ej)
      |SELECT CAST(pp AS BIGINT) AS n_events,
      |       CAST(nn AS BIGINT) AS n_nonevents,
      |       CAST((1000000 * (up_e - dn_e)) // pp AS BIGINT)
      |         AS nri_events_micro,
      |       CAST((1000000 * (dn_n - up_n)) // nn AS BIGINT)
      |         AS nri_nonevents_micro,
      |       CAST((1000000 * (up_e - dn_e)) // pp
      |            + (1000000 * (dn_n - up_n)) // nn AS BIGINT)
      |         AS nri_total_micro
      |FROM ct
      |""".stripMargin)) { (s, dir) =>
    val l = Tables.lineitem(s, dir)
      .select(expr("CAST(floor(l_discount * 100 + 0.5) AS BIGINT)")
          .as("b"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"),
        year(col("l_shipdate")).as("yr"),
        col("l_quantity").cast("long").as("q"))
      .materialize()
    val tr = l.where(col("yr") <= 1997).groupBy(col("b"))
      .agg(expr("(1000 * sum(y)) div count(1)").as("p"))
    val tq = l.where(col("yr") <= 1997)
      .groupBy(expr("(q - 1) div 5").as("qb"))
      .agg(expr("(1000 * sum(y)) div count(1)").as("pq"))
    l.where(col("yr") >= 1998)
      .join(broadcast(tr.withColumnRenamed("b", "tb")),
        col("b") === col("tb"))
      .join(broadcast(tq), expr("(q - 1) div 5") === col("qb"))
      .agg(
        sum(when(col("y") === 1 && col("pq") > col("p"), 1L)
          .otherwise(0L)).as("up_e"),
        sum(when(col("y") === 1 && col("pq") < col("p"), 1L)
          .otherwise(0L)).as("dn_e"),
        sum(when(col("y") === 0 && col("pq") > col("p"), 1L)
          .otherwise(0L)).as("up_n"),
        sum(when(col("y") === 0 && col("pq") < col("p"), 1L)
          .otherwise(0L)).as("dn_n"),
        sum(col("y")).as("pp"), sum(lit(1L) - col("y")).as("nn"))
      .select(col("pp").cast("long").as("n_events"),
        col("nn").cast("long").as("n_nonevents"),
        expr("CAST((1000000 * (up_e - dn_e)) div pp AS BIGINT)")
          .as("nri_events_micro"),
        expr("CAST((1000000 * (dn_n - up_n)) div nn AS BIGINT)")
          .as("nri_nonevents_micro"),
        expr("CAST((1000000 * (up_e - dn_e)) div pp" +
          " + (1000000 * (dn_n - up_n)) div nn AS BIGINT)")
          .as("nri_total_micro"))
  }
}
