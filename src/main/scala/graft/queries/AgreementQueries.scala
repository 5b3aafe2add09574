package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables

/** Round-9 agreement/measurement wave: Fleiss' κ and Gwet's AC1 over
  * three binary order "raters", Bland–Altman agreement limits between
  * the order-header total and the line-derived total, Cronbach's α
  * over four order-size items, and the biweight midvariance of daily
  * net revenue. All agreement statistics are exact counts + one pinned
  * double; Bland–Altman/Cronbach ride exact decimal moments; the
  * biweight terms are per-day quantized integers on the calendar
  * dim. */
object AgreementQueries {

  val all: Seq[Q] = Seq(q691, q692, q693, q694, q695)

  /** The three binary "raters" per order (q653's matched-flag trio):
    * deep discount, any return, urgent priority — here read as three
    * imperfect raters of the same "problematic order" construct. */
  private def sqlRaters: String =
    """rt AS (
      |  SELECT o.o_orderkey AS id,
      |         max(CASE WHEN l.l_discount >= 0.05 THEN 1 ELSE 0 END)
      |           AS r1,
      |         max(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
      |           AS r2,
      |         max(CASE WHEN o.o_orderpriority = '1-URGENT'
      |             THEN 1 ELSE 0 END) AS r3
      |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |  GROUP BY 1)""".stripMargin

  private def raters(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey").as("id"), col("o_orderpriority"))
      .join(Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_discount"), col("l_returnflag")),
        col("id") === col("l_orderkey"))
      .groupBy(col("id"))
      .agg(max(when(col("l_discount") >= 0.05, 1L).otherwise(0L)).as("r1"),
        max(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("r2"),
        max(when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L))
          .as("r3"))

  /** Fleiss' κ for 3 raters × 2 categories: per-subject agreement
    * P_i = (Σ n_ij² − n)/(n(n−1)) with n = 3 decomposes into exact
    * integer sums of k_i = r1+r2+r3 (n_i1 = k_i, n_i0 = 3−k_i):
    * Σn_ij² = k² + (3−k)². κ = (P̄ − P̄e)/(1 − P̄e), one pinned
    * double. The multi-rater generalization q175's pairwise Cohen
    * faces can't give. */
  def q691: Q = {
    val pbar = "((CAST(sq AS DOUBLE) - 3.0 * CAST(n AS DOUBLE))" +
      " / (6.0 * CAST(n AS DOUBLE)))"
    val pe = "((CAST(sk AS DOUBLE) / (3.0 * CAST(n AS DOUBLE)))" +
      " * (CAST(sk AS DOUBLE) / (3.0 * CAST(n AS DOUBLE)))" +
      " + (1.0 - CAST(sk AS DOUBLE) / (3.0 * CAST(n AS DOUBLE)))" +
      " * (1.0 - CAST(sk AS DOUBLE) / (3.0 * CAST(n AS DOUBLE))))"
    Q("q691_fleiss_kappa",
      Some(s"""
        |WITH ${sqlRaters},
        |ks AS (SELECT r1 + r2 + r3 AS k FROM rt),
        |mo AS (
        |  SELECT count(*) AS n, sum(k) AS sk,
        |         sum(k * k + (3 - k) * (3 - k)) AS sq
        |  FROM ks)
        |SELECT CAST(n AS BIGINT) AS n_orders,
        |       CAST(sk AS BIGINT) AS n_positive_votes,
        |       CAST(floor($pbar * 1000000.0) AS BIGINT) AS pbar_micro,
        |       CAST(floor($pe * 1000000.0) AS BIGINT) AS pe_micro,
        |       CAST(floor(($pbar - $pe) / (1.0 - $pe) * 1000.0)
        |            AS BIGINT) AS fleiss_kappa_milli
        |FROM mo
        |""".stripMargin)) { (s, dir) =>
      raters(s, dir)
        .select((col("r1") + col("r2") + col("r3")).as("k"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sk"),
          sum(col("k") * col("k") + (lit(3L) - col("k"))
            * (lit(3L) - col("k"))).as("sq"))
        .select(col("n").as("n_orders"),
          col("sk").as("n_positive_votes"),
          expr(s"CAST(floor($pbar * 1000000.0) AS BIGINT)")
            .as("pbar_micro"),
          expr(s"CAST(floor($pe * 1000000.0) AS BIGINT)").as("pe_micro"),
          expr(s"CAST(floor(($pbar - $pe) / (1.0 - $pe) * 1000.0)" +
            " AS BIGINT)").as("fleiss_kappa_milli"))
    }
  }

  /** Gwet's AC1 over the same rater trio — the chance correction that
    * stays stable when category prevalence is extreme (Fleiss κ's
    * paradox): pe(γ) = 2π(1−π) with π the overall positive rate;
    * AC1 = (P̄ − pe)/(1 − pe). Reported with the κ−AC1 gap so the
    * prevalence effect is visible in one row. */
  def q692: Q = {
    val pbar = "((CAST(sq AS DOUBLE) - 3.0 * CAST(n AS DOUBLE))" +
      " / (6.0 * CAST(n AS DOUBLE)))"
    val pi = "(CAST(sk AS DOUBLE) / (3.0 * CAST(n AS DOUBLE)))"
    val peG = s"(2.0 * $pi * (1.0 - $pi))"
    val peK = s"($pi * $pi + (1.0 - $pi) * (1.0 - $pi))"
    Q("q692_gwet_ac1",
      Some(s"""
        |WITH ${sqlRaters},
        |ks AS (SELECT r1 + r2 + r3 AS k FROM rt),
        |mo AS (
        |  SELECT count(*) AS n, sum(k) AS sk,
        |         sum(k * k + (3 - k) * (3 - k)) AS sq
        |  FROM ks)
        |SELECT CAST(n AS BIGINT) AS n_orders,
        |       CAST(floor($pi * 1000000.0) AS BIGINT) AS prevalence_micro,
        |       CAST(floor(($pbar - $peG) / (1.0 - $peG) * 1000.0)
        |            AS BIGINT) AS gwet_ac1_milli,
        |       CAST(floor(($pbar - $peG) / (1.0 - $peG) * 1000.0)
        |            - floor(($pbar - $peK) / (1.0 - $peK) * 1000.0)
        |         AS BIGINT) AS ac1_minus_kappa_milli
        |FROM mo
        |""".stripMargin)) { (s, dir) =>
      raters(s, dir)
        .select((col("r1") + col("r2") + col("r3")).as("k"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sk"),
          sum(col("k") * col("k") + (lit(3L) - col("k"))
            * (lit(3L) - col("k"))).as("sq"))
        .select(col("n").as("n_orders"),
          expr(s"CAST(floor($pi * 1000000.0) AS BIGINT)")
            .as("prevalence_micro"),
          expr(s"CAST(floor(($pbar - $peG) / (1.0 - $peG) * 1000.0)" +
            " AS BIGINT)").as("gwet_ac1_milli"),
          expr(s"CAST(floor(($pbar - $peG) / (1.0 - $peG) * 1000.0)" +
            s" - floor(($pbar - $peK) / (1.0 - $peK) * 1000.0)" +
            " AS BIGINT)").as("ac1_minus_kappa_milli"))
    }
  }

  /** Bland–Altman agreement between the order-header total and the
    * line-derived total Σ extendedprice·(1−discount)·(1+tax): the bias
    * (mean difference), the ±1.96σ limits of agreement, and the exact
    * count of orders OUTSIDE the limits — the reconciliation audit
    * that says whether two bookkeeping paths agree within noise. Line
    * terms are cent-floored per line (stated contract) so every sum is
    * an exact integer; σ from exact moments, one pinned sqrt. */
  def q693: Q = {
    val sd = "sqrt((CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE)" +
      " - CAST(sd_ AS DOUBLE) * CAST(sd_ AS DOUBLE))" +
      " / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))"
    val mu = "(CAST(sd_ AS DOUBLE) / CAST(n AS DOUBLE))"
    Q("q693_bland_altman",
      Some(s"""
        |WITH lt AS (
        |  SELECT l_orderkey AS ok,
        |         sum(CAST(floor(l_extendedprice * (1 - l_discount)
        |             * (1 + l_tax) * 100) AS BIGINT)) AS m2
        |  FROM lineitem GROUP BY 1),
        |dd AS (
        |  SELECT CAST(CAST(o.o_totalprice * 100 AS HUGEINT) AS BIGINT)
        |           - lt.m2 AS d
        |  FROM orders o JOIN lt ON lt.ok = o.o_orderkey),
        |mo AS (SELECT count(*) AS n, sum(d) AS sd_,
        |              sum(CAST(d AS HUGEINT) * d) AS sdd FROM dd),
        |lim AS (
        |  SELECT n, sd_, sdd,
        |         $mu AS mu, $sd AS sdv
        |  FROM mo),
        |outc AS (
        |  SELECT count(*) AS n_out
        |  FROM dd CROSS JOIN lim
        |  WHERE CAST(d AS DOUBLE) > lim.mu + 1.96 * lim.sdv
        |     OR CAST(d AS DOUBLE) < lim.mu - 1.96 * lim.sdv)
        |SELECT CAST(lim.n AS BIGINT) AS n_orders,
        |       CAST(floor(lim.mu * 1000.0) AS BIGINT) AS bias_millicents,
        |       CAST(floor((lim.mu - 1.96 * lim.sdv) * 1000.0) AS BIGINT)
        |         AS loa_low_millicents,
        |       CAST(floor((lim.mu + 1.96 * lim.sdv) * 1000.0) AS BIGINT)
        |         AS loa_high_millicents,
        |       CAST(outc.n_out AS BIGINT) AS n_outside
        |FROM lim CROSS JOIN outc
        |""".stripMargin)) { (s, dir) =>
      val lt = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey").as("ok"))
        .agg(sum(expr("CAST(floor(l_extendedprice * (1 - l_discount)" +
          " * (1 + l_tax) * 100) AS BIGINT)")).as("m2"))
      val dd = Tables.orders(s, dir)
        .select(col("o_orderkey"),
          expr("CAST(CAST(o_totalprice * 100 AS DECIMAL(38,0)) AS BIGINT)")
            .as("m1"))
        .join(lt, col("o_orderkey") === col("ok"))
        .select((col("m1") - col("m2")).as("d"))
        .materialize() // read twice: moments + outside count
      val lim = dd.agg(count(lit(1)).as("n"), sum(col("d")).as("sd_"),
          sum(col("d").cast("decimal(38,0)") * col("d")).as("sdd"))
        .select(col("n"), col("sd_"), col("sdd"),
          expr(mu).as("mu"), expr(sd).as("sdv"))
      val outc = dd.crossJoin(broadcast(lim))
        .where(col("d").cast("double") > col("mu") + lit(1.96) * col("sdv")
          || col("d").cast("double") < col("mu") - lit(1.96) * col("sdv"))
        .agg(count(lit(1)).as("n_out"))
      lim.crossJoin(broadcast(outc))
        .select(col("n").as("n_orders"),
          expr("CAST(floor(mu * 1000.0) AS BIGINT)").as("bias_millicents"),
          expr("CAST(floor((mu - 1.96 * sdv) * 1000.0) AS BIGINT)")
            .as("loa_low_millicents"),
          expr("CAST(floor((mu + 1.96 * sdv) * 1000.0) AS BIGINT)")
            .as("loa_high_millicents"),
          col("n_out").as("n_outside"))
    }
  }

  /** Cronbach's α over four order-size "items" (line count, total
    * quantity, distinct parts, distinct suppliers): α = k/(k−1)·
    * (1 − Σσ_i²/σ_total²) with every variance an exact integer moment
    * of small counts — the internal-consistency check that the four
    * columns measure one construct before anyone averages them into a
    * score. */
  def q694: Q = {
    def varN(sx: String, sxx: String) =
      s"(CAST(n AS DOUBLE) * CAST($sxx AS DOUBLE)" +
        s" - CAST($sx AS DOUBLE) * CAST($sx AS DOUBLE))"
    val sumVar = Seq(("s1", "q1"), ("s2", "q2"), ("s3", "q3"),
      ("s4", "q4")).map { case (a, b) => varN(a, b) }.mkString(" + ")
    val varT = varN("st", "qt")
    Q("q694_cronbach_alpha",
      Some(s"""
        |WITH it AS (
        |  SELECT l_orderkey AS ok,
        |         count(*) AS i1,
        |         sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS i2,
        |         count(DISTINCT l_partkey) AS i3,
        |         count(DISTINCT l_suppkey) AS i4
        |  FROM lineitem GROUP BY 1),
        |mo AS (
        |  SELECT count(*) AS n,
        |         sum(i1) AS s1, sum(i1 * i1) AS q1,
        |         sum(i2) AS s2, sum(i2 * i2) AS q2,
        |         sum(i3) AS s3, sum(i3 * i3) AS q3,
        |         sum(i4) AS s4, sum(i4 * i4) AS q4,
        |         sum(i1 + i2 + i3 + i4) AS st,
        |         sum(CAST(i1 + i2 + i3 + i4 AS HUGEINT)
        |             * (i1 + i2 + i3 + i4)) AS qt
        |  FROM it)
        |SELECT CAST(n AS BIGINT) AS n_orders,
        |       CAST(floor(($sumVar) / ($varT) * 1000000.0) AS BIGINT)
        |         AS var_ratio_micro,
        |       CAST(floor(4.0 / 3.0 * (1.0 - ($sumVar) / ($varT))
        |            * 1000.0) AS BIGINT) AS cronbach_alpha_milli
        |FROM mo
        |""".stripMargin)) { (s, dir) =>
      val it = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey").as("ok"))
        .agg(count(lit(1)).as("i1"),
          sum(expr("CAST(floor(l_quantity + 0.5) AS BIGINT)")).as("i2"),
          countDistinct(col("l_partkey")).as("i3"),
          countDistinct(col("l_suppkey")).as("i4"))
      it.agg(count(lit(1)).as("n"),
          sum(col("i1")).as("s1"), sum(col("i1") * col("i1")).as("q1"),
          sum(col("i2")).as("s2"), sum(col("i2") * col("i2")).as("q2"),
          sum(col("i3")).as("s3"), sum(col("i3") * col("i3")).as("q3"),
          sum(col("i4")).as("s4"), sum(col("i4") * col("i4")).as("q4"),
          sum(col("i1") + col("i2") + col("i3") + col("i4")).as("st"),
          sum((col("i1") + col("i2") + col("i3") + col("i4"))
            .cast("decimal(38,0)")
            * (col("i1") + col("i2") + col("i3") + col("i4"))).as("qt"))
        .select(col("n").as("n_orders"),
          expr(s"CAST(floor(($sumVar) / ($varT) * 1000000.0) AS BIGINT)")
            .as("var_ratio_micro"),
          expr(s"CAST(floor(4.0 / 3.0 * (1.0 - ($sumVar) / ($varT))" +
            " * 1000.0) AS BIGINT)").as("cronbach_alpha_milli"))
    }
  }

  /** Biweight midvariance of daily net revenue — the robust spread
    * estimate that keeps 9-MAD-windowed efficiency where plain MAD
    * throws information away: u_d = (x_d − M)/(9·MAD), terms
    * (x−M)²(1−u²)⁴ and (1−u²)(1−5u²) quantized per DAY (calendar
    * dim), BWMV = n·Σnum/(Σden)². Reported against the classical
    * variance as a ratio. M and MAD are exact order statistics over
    * the day dim. */
  def q695: Q = Q(
    "q695_biweight_midvariance",
    Some(s"""
      |WITH ${DailyNet.sql.stripPrefix("\n")},
      |dv AS (SELECT day, CAST(net // 100 AS BIGINT) AS x FROM d),
      |md AS (
      |  SELECT max(CASE WHEN rn = (500 * n + 999) // 1000 THEN x END)
      |           AS m
      |  FROM (SELECT x, row_number() OVER (ORDER BY x) AS rn,
      |               count(*) OVER () AS n FROM dv) r),
      |ad AS (SELECT dv.x, abs(dv.x - md.m) AS a FROM dv CROSS JOIN md),
      |mad AS (
      |  SELECT max(CASE WHEN rn = (500 * n + 999) // 1000 THEN a END)
      |           AS mad
      |  FROM (SELECT a, row_number() OVER (ORDER BY a) AS rn,
      |               count(*) OVER () AS n FROM ad) r),
      |tm AS (
      |  SELECT ad.x, ad.a,
      |         CAST(ad.x - md.m AS DOUBLE)
      |           / (9.0 * CAST(mad.mad AS DOUBLE)) AS u
      |  FROM ad CROSS JOIN md CROSS JOIN mad),
      |qt AS (
      |  SELECT CASE WHEN abs(u) < 1.0 THEN
      |           CAST(floor(CAST(a AS DOUBLE) * CAST(a AS DOUBLE)
      |             * (1.0 - u * u) * (1.0 - u * u) * (1.0 - u * u)
      |             * (1.0 - u * u) * 1000.0) AS BIGINT) ELSE 0 END
      |           AS num_milli,
      |         CASE WHEN abs(u) < 1.0 THEN
      |           CAST(floor((1.0 - u * u) * (1.0 - 5.0 * u * u)
      |             * 1000000.0) AS BIGINT) ELSE 0 END AS den_micro,
      |         CASE WHEN abs(u) < 1.0 THEN 1 ELSE 0 END AS kept
      |  FROM tm),
      |mo AS (SELECT count(*) AS n, sum(num_milli) AS sn,
      |              sum(den_micro) AS sd_, sum(kept) AS nk FROM qt)
      |SELECT CAST(n AS BIGINT) AS n_days,
      |       CAST((SELECT m FROM md) AS BIGINT) AS median_dollars,
      |       CAST((SELECT mad FROM mad) AS BIGINT) AS mad_dollars,
      |       CAST(nk AS BIGINT) AS n_within_9mad,
      |       CAST(floor(CAST(n AS DOUBLE) * CAST(sn AS DOUBLE) / 1000.0
      |            / (CAST(sd_ AS DOUBLE) / 1000000.0
      |               * CAST(sd_ AS DOUBLE) / 1000000.0)) AS BIGINT)
      |         AS bwmv_dollars2
      |FROM mo
      |""".stripMargin)) { (s, dir) =>
    val dv = DailyNet.frame(s, dir)
      .select(col("day"), expr("CAST(net div 100 AS BIGINT)").as("x"))
      .materialize() // day dim
    val md = graft.operators.OrderStats.quantilesDisc(
        dv.withColumn("k", lit(0L)), Seq("k"), "x", Seq(500))
      .select(col("value").as("m"))
    val ad = dv.crossJoin(broadcast(md))
      .select(col("x"), abs(col("x") - col("m")).as("a"))
      .materialize()
    val mad = graft.operators.OrderStats.quantilesDisc(
        ad.withColumn("k", lit(0L)), Seq("k"), "a", Seq(500))
      .select(col("value").as("mad"))
    val tm = ad.crossJoin(broadcast(md)).crossJoin(broadcast(mad))
      .select(col("x"), col("a"),
        (((col("x") - col("m")).cast("double"))
          / (lit(9.0) * col("mad").cast("double"))).as("u"))
    val qt = tm.select(
      when(abs(col("u")) < 1.0,
        expr("""CAST(floor(CAST(a AS DOUBLE) * CAST(a AS DOUBLE)
            * (1.0 - u * u) * (1.0 - u * u) * (1.0 - u * u)
            * (1.0 - u * u) * 1000.0) AS BIGINT)""")).otherwise(0L)
        .as("num_milli"),
      when(abs(col("u")) < 1.0,
        expr("""CAST(floor((1.0 - u * u) * (1.0 - 5.0 * u * u)
            * 1000000.0) AS BIGINT)""")).otherwise(0L).as("den_micro"),
      when(abs(col("u")) < 1.0, 1L).otherwise(0L).as("kept"))
    qt.agg(count(lit(1)).as("n"), sum(col("num_milli")).as("sn"),
        sum(col("den_micro")).as("sd_"), sum(col("kept")).as("nk"))
      .crossJoin(broadcast(md))
      .crossJoin(broadcast(mad))
      .select(col("n").as("n_days"), col("m").as("median_dollars"),
        col("mad").as("mad_dollars"), col("nk").as("n_within_9mad"),
        expr("""CAST(floor(CAST(n AS DOUBLE) * CAST(sn AS DOUBLE) / 1000.0
             / (CAST(sd_ AS DOUBLE) / 1000000.0
                * CAST(sd_ AS DOUBLE) / 1000000.0)) AS BIGINT)""")
          .as("bwmv_dollars2"))
  }
}
