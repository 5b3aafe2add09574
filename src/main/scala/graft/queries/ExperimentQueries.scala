package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-11 experiment-design wave on the events stream: the
  * missing pieces beside the existing A/B kit (q419 SPRT, q446
  * CUPED, two-proportion z) — sample-ratio-mismatch checks, the
  * MDE/power accrual panel, Pocock vs O'Brien–Fleming
  * group-sequential boundaries on the real z path, alpha-spending
  * accounting, and an experiment-runtime estimator.
  *
  * Design (stated identically in both engines): users are assigned
  * arms by the multiplicative-hash congruence
  * arm = ((user_id·2654435761) mod 2³¹) mod 2; the metric is the
  * per-user PURCHASE COUNT (every user purchases in this stream, so
  * binary conversion is degenerate); looks split the 30-day
  * calendar into 5 equal windows; z_α/2 + z_β = 2.801585 and the
  * Pocock (2.413) / OBF (2.0401·√(K/k)) constants are embedded
  * public table values; Φ rides the Abramowitz–Stegun 7.1.26 erfc
  * polynomial as pinned shared text (the q766 discipline).
  *
  * Exactness: counts and hash arithmetic are exact integers; every
  * z / MDE / α finishes in one shared-text double step from exact
  * per-arm moments, milli/micro-floored in the output.
  *
  * Scale: each query is ONE events scan → per-user aggregate →
  * per-arm/look moments (map-side-combine; the user dim is the only
  * shuffle key). */
object ExperimentQueries {

  val all: Seq[Q] = Seq(q1151, q1152, q1153, q1154, q1155)

  /** A-S 7.1.26 upper-tail: P(Z > x) for x ≥ 0, pinned text. */
  private def tail(x: String): String = {
    val u = s"($x / sqrt(2.0))"
    val t = s"(1.0 / (1.0 + 0.3275911 * $u))"
    s"(0.5 * (0.254829592 * $t - 0.284496736 * $t * $t" +
      s" + 1.421413741 * $t * $t * $t" +
      s" - 1.453152027 * $t * $t * $t * $t" +
      s" + 1.061405429 * $t * $t * $t * $t * $t) * exp(-($u) * ($u)))"
  }

  /** Oracle per-user frame us(uid, arm, day0, purchases). */
  private def sqlUs: String = """
    |ev AS (SELECT user_id AS uid,
    |              ((user_id * 2654435761) % 2147483648) % 2 AS arm,
    |              epoch_us(ts) // 86400000000 AS day,
    |              event_type
    |       FROM events),
    |d0 AS (SELECT min(day) AS dmin, max(day) AS dmax FROM ev),
    |us AS (SELECT uid, max(arm) AS arm,
    |              sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
    |                  END) AS pc
    |       FROM ev GROUP BY 1)""".stripMargin

  /** Spark twin of the per-user frame (uid, arm, pc). */
  private def us(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("user_id").as("uid"),
        expr("((user_id * 2654435761) % 2147483648) % 2").as("arm"),
        col("event_type"))
      .groupBy(col("uid"))
      .agg(max(col("arm")).as("arm"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("pc"))

  /** Sample-ratio mismatch: user-count split plus per-event-type
    * event-count splits, χ² = (na−nb)²/(na+nb) each. */
  def q1151: Q = Q(
    "q1151_sample_ratio_mismatch",
    Some(s"""
      |WITH ${sqlUs},
      |uc AS (SELECT 'users' AS slice,
      |         sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS na,
      |         sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS nb
      |       FROM us),
      |ec AS (SELECT event_type AS slice,
      |         sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS na,
      |         sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS nb
      |       FROM ev GROUP BY 1),
      |al AS (SELECT * FROM uc UNION ALL SELECT * FROM ec)
      |SELECT slice, CAST(na AS BIGINT) AS arm_a, CAST(nb AS BIGINT)
      |         AS arm_b,
      |       CAST((1000 * (na - nb) * (na - nb)) // (na + nb) AS BIGINT)
      |         AS chi2_milli
      |FROM al ORDER BY slice
      |""".stripMargin)) { (s, dir) =>
    val ev = Tables.events(s, dir)
      .select(expr("((user_id * 2654435761) % 2147483648) % 2")
        .as("arm"), col("event_type"), col("user_id").as("uid"))
    val uc = us(s, dir)
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("na"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("nb"))
      .select(lit("users").as("slice"), col("na"), col("nb"))
    val ec = ev.groupBy(col("event_type").as("slice"))
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("na"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("nb"))
    uc.unionAll(ec)
      .select(col("slice"), col("na").cast("long").as("arm_a"),
        col("nb").cast("long").as("arm_b"),
        expr("CAST((1000 * (na - nb) * (na - nb)) div (na + nb)" +
          " AS BIGINT)").as("chi2_milli"))
      .orderBy(col("slice"))
  }

  /** MDE accrual panel: for each horizon (first 6/12/18/24/30 days),
    * the pooled per-user purchase-count variance and the relative
    * MDE at α = 5%, power 80%. */
  def q1152: Q = {
    val mean = "(CAST(sp AS DOUBLE) / CAST(nu AS DOUBLE))"
    val vr = "((CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE)" +
      " * CAST(sp AS DOUBLE) / CAST(nu AS DOUBLE)) / CAST(nu AS DOUBLE))"
    val mde = s"(2.801585 * sqrt(2.0 * $vr / (CAST(nu AS DOUBLE) / 2.0)))"
    Q("q1152_mde_accrual_panel",
      Some(s"""
        |WITH ${sqlUs},
        |hz AS (SELECT * FROM (VALUES (6),(12),(18),(24),(30)) v(h)),
        |uh AS (SELECT hz.h, ev.uid,
        |         sum(CASE WHEN ev.event_type = 'purchase' THEN 1 ELSE 0
        |             END) AS pc
        |       FROM hz CROSS JOIN ev CROSS JOIN d0
        |       WHERE ev.day < d0.dmin + hz.h
        |       GROUP BY 1, 2),
        |mo AS (SELECT h, count(*) AS nu, sum(pc) AS sp,
        |         sum(CAST(pc AS BIGINT) * pc) AS spp
        |       FROM uh GROUP BY 1)
        |SELECT CAST(h AS BIGINT) AS horizon_days,
        |       CAST(nu AS BIGINT) AS n_users,
        |       CAST(floor(1000.0 * $mean) AS BIGINT) AS mean_pc_milli,
        |       CAST(floor(1000.0 * $mde) AS BIGINT) AS mde_abs_milli,
        |       CAST(floor(1000.0 * $mde / $mean) AS BIGINT)
        |         AS mde_rel_milli
        |FROM mo ORDER BY horizon_days
        |""".stripMargin)) { (s, dir) =>
      import s.implicits._
      val ev = Tables.events(s, dir)
        .select(col("user_id").as("uid"),
          expr("ts div 86400000000000").as("day"), col("event_type"))
      val d0 = ev.agg(min(col("day")).as("dmin"))
      val hz = broadcast(Seq(6, 12, 18, 24, 30).toDF("h"))
      val uh = ev.crossJoin(broadcast(d0)).crossJoin(hz)
        .where(col("day") < col("dmin") + col("h"))
        .groupBy(col("h"), col("uid"))
        .agg(sum(when(col("event_type") === "purchase", 1L)
          .otherwise(0L)).as("pc"))
      uh.groupBy(col("h"))
        .agg(count(lit(1)).as("nu"), sum(col("pc")).as("sp"),
          sum(expr("CAST(pc AS BIGINT) * pc")).as("spp"))
        .select(col("h").cast("long").as("horizon_days"),
          col("nu").cast("long").as("n_users"),
          expr(s"CAST(floor(1000.0 * $mean) AS BIGINT)")
            .as("mean_pc_milli"),
          expr(s"CAST(floor(1000.0 * $mde) AS BIGINT)")
            .as("mde_abs_milli"),
          expr(s"CAST(floor(1000.0 * $mde / $mean) AS BIGINT)")
            .as("mde_rel_milli"))
        .orderBy(col("horizon_days"))
    }
  }

  /** Shared look-frame text: per-look per-arm purchase moments
    * lk(k, arm, nu, sp, spp) over the first 6k days. */
  private def sqlLk: String = s"""
    |${sqlUs},
    |ks AS (SELECT * FROM (VALUES (1),(2),(3),(4),(5)) v(k)),
    |ul AS (SELECT ks.k, ev.uid, max(ev.arm) AS arm,
    |         sum(CASE WHEN ev.event_type = 'purchase' THEN 1 ELSE 0
    |             END) AS pc
    |       FROM ks CROSS JOIN ev CROSS JOIN d0
    |       WHERE ev.day < d0.dmin + 6 * ks.k
    |       GROUP BY 1, 2),
    |lk AS (SELECT k, arm, count(*) AS nu, sum(pc) AS sp,
    |         sum(CAST(pc AS BIGINT) * pc) AS spp
    |       FROM ul GROUP BY 1, 2)""".stripMargin

  /** Spark twin of [[sqlLk]]. */
  private def lk(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select(col("user_id").as("uid"),
        expr("((user_id * 2654435761) % 2147483648) % 2").as("arm"),
        expr("ts div 86400000000000").as("day"), col("event_type"))
    val d0 = ev.agg(min(col("day")).as("dmin"))
    val ks = broadcast(Seq(1, 2, 3, 4, 5).toDF("k"))
    ev.crossJoin(broadcast(d0)).crossJoin(ks)
      .where(col("day") < col("dmin") + lit(6) * col("k"))
      .groupBy(col("k"), col("uid"))
      .agg(max(col("arm")).as("arm"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("pc"))
      .groupBy(col("k"), col("arm"))
      .agg(count(lit(1)).as("nu"), sum(col("pc")).as("sp"),
        sum(expr("CAST(pc AS BIGINT) * pc")).as("spp"))
  }

  /** Two-sample z text over joined a/b per-look moments. */
  private def zTxt: String =
    "((CAST(spa AS DOUBLE) / CAST(nua AS DOUBLE)" +
      " - CAST(spb AS DOUBLE) / CAST(nub AS DOUBLE))" +
      " / sqrt((CAST(sppa AS DOUBLE) - CAST(spa AS DOUBLE)" +
      " * CAST(spa AS DOUBLE) / CAST(nua AS DOUBLE))" +
      " / CAST(nua AS DOUBLE) / CAST(nua AS DOUBLE)" +
      " + (CAST(sppb AS DOUBLE) - CAST(spb AS DOUBLE)" +
      " * CAST(spb AS DOUBLE) / CAST(nub AS DOUBLE))" +
      " / CAST(nub AS DOUBLE) / CAST(nub AS DOUBLE)))"

  /** Group-sequential boundaries: the real z path at 5 looks vs the
    * Pocock and O'Brien–Fleming critical values. */
  def q1153: Q = {
    val obf = "(2.0401 * sqrt(5.0 / CAST(k AS DOUBLE)))"
    Q("q1153_group_sequential",
      Some(s"""
        |WITH ${sqlLk},
        |ab AS (SELECT a.k, a.nu AS nua, a.sp AS spa, a.spp AS sppa,
        |              b.nu AS nub, b.sp AS spb, b.spp AS sppb
        |       FROM lk a JOIN lk b ON a.k = b.k AND a.arm = 0
        |            AND b.arm = 1)
        |SELECT CAST(k AS BIGINT) AS look,
        |       CAST(nua + nub AS BIGINT) AS n_users,
        |       CAST(floor(1000.0 * $zTxt) AS BIGINT) AS z_milli,
        |       CAST(2413 AS BIGINT) AS pocock_milli,
        |       CAST(floor(1000.0 * $obf) AS BIGINT) AS obf_milli,
        |       CAST(CASE WHEN abs($zTxt) > 2.413 THEN 1 ELSE 0 END
        |            AS BIGINT) AS crossed_pocock,
        |       CAST(CASE WHEN abs($zTxt) > $obf THEN 1 ELSE 0 END
        |            AS BIGINT) AS crossed_obf
        |FROM ab ORDER BY look
        |""".stripMargin)) { (s, dir) =>
      val l = lk(s, dir)
      val a = l.where(col("arm") === 0)
        .select(col("k"), col("nu").as("nua"), col("sp").as("spa"),
          col("spp").as("sppa"))
      val b = l.where(col("arm") === 1)
        .select(col("k").as("kb"), col("nu").as("nub"),
          col("sp").as("spb"), col("spp").as("sppb"))
      a.join(b, col("k") === col("kb"))
        .select(col("k").cast("long").as("look"),
          (col("nua") + col("nub")).cast("long").as("n_users"),
          expr(s"CAST(floor(1000.0 * $zTxt) AS BIGINT)").as("z_milli"),
          lit(2413L).as("pocock_milli"),
          expr(s"CAST(floor(1000.0 * $obf) AS BIGINT)").as("obf_milli"),
          expr(s"CAST(CASE WHEN abs($zTxt) > 2.413 THEN 1 ELSE 0 END" +
            " AS BIGINT)").as("crossed_pocock"),
          expr(s"CAST(CASE WHEN abs($zTxt) > $obf THEN 1 ELSE 0 END" +
            " AS BIGINT)").as("crossed_obf"))
        .orderBy(col("look"))
    }
  }

  /** O'Brien–Fleming-like alpha spending at the observed information
    * fractions (purchase-event share per look, stated proxy):
    * α(t) = 4·P(Z > 1.959964/√t) via the pinned A-S tail. */
  def q1154: Q = {
    val t = "(CAST(sp AS DOUBLE) / CAST(spTot AS DOUBLE))"
    val a = s"(4.0 * ${tail(s"(1.959964 / sqrt($t))")})"
    Q("q1154_alpha_spending",
      Some(s"""
        |WITH ${sqlLk},
        |tk AS (SELECT k, sum(sp) AS sp FROM lk GROUP BY 1),
        |tot AS (SELECT max(sp) AS spTot FROM tk),
        |spq AS (SELECT k, sp,
        |         CAST(floor(1000.0 * $t) AS BIGINT) AS t_milli,
        |         CAST(floor(1000000.0 * $a) AS BIGINT) AS spent_micro
        |       FROM tk CROSS JOIN tot)
        |SELECT CAST(k AS BIGINT) AS look,
        |       t_milli, spent_micro,
        |       spent_micro - coalesce(lag(spent_micro, 1)
        |         OVER (ORDER BY k), 0) AS inc_micro
        |FROM spq ORDER BY look
        |""".stripMargin)) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val tk = lk(s, dir).groupBy(col("k"))
        .agg(sum(col("sp")).as("sp"))
      val tot = tk.agg(max(col("sp")).as("spTot"))
      tk.crossJoin(broadcast(tot))
        .select(col("k"),
          expr(s"CAST(floor(1000.0 * $t) AS BIGINT)").as("t_milli"),
          expr(s"CAST(floor(1000000.0 * $a) AS BIGINT)")
            .as("spent_micro"))
        .select(col("k").cast("long").as("look"), col("t_milli"),
          col("spent_micro"),
          (col("spent_micro") - coalesce(lag(col("spent_micro"), 1)
            .over(Window.orderBy(col("k"))), lit(0L))).as("inc_micro"))
        .orderBy(col("look"))
    }
  }

  /** Runtime estimator: users-per-arm and accrual days needed to
    * detect relative lifts of 5/10/20% on the purchase-count metric
    * at α = 5%, power 80%. */
  def q1155: Q = {
    val mean = "(CAST(sp AS DOUBLE) / CAST(nu AS DOUBLE))"
    val vr = "((CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE)" +
      " * CAST(sp AS DOUBLE) / CAST(nu AS DOUBLE)) / CAST(nu AS DOUBLE))"
    val nreq = s"(2.0 * $vr * 2.801585 * 2.801585" +
      s" / ((CAST(lift AS DOUBLE) / 1000.0) * $mean" +
      s" * (CAST(lift AS DOUBLE) / 1000.0) * $mean))"
    val days = s"(ceil(2.0 * $nreq / (CAST(nu AS DOUBLE)" +
      " / CAST(nd AS DOUBLE))))"
    Q("q1155_runtime_estimator",
      Some(s"""
        |WITH ${sqlUs},
        |mo AS (SELECT count(*) AS nu, sum(pc) AS sp,
        |         sum(CAST(pc AS BIGINT) * pc) AS spp
        |       FROM us),
        |nd AS (SELECT dmax - dmin + 1 AS nd FROM d0),
        |lifts AS (SELECT * FROM (VALUES (50),(100),(200)) v(lift))
        |SELECT CAST(lift AS BIGINT) AS lift_milli,
        |       CAST(floor($nreq) AS BIGINT) AS users_per_arm,
        |       CAST(floor($days) AS BIGINT) AS days_needed
        |FROM lifts CROSS JOIN mo CROSS JOIN nd ORDER BY lift_milli
        |""".stripMargin)) { (s, dir) =>
      import s.implicits._
      val ev = Tables.events(s, dir)
        .select(col("user_id").as("uid"),
          expr("ts div 86400000000000").as("day"), col("event_type"))
      val mo = ev.groupBy(col("uid"))
        .agg(sum(when(col("event_type") === "purchase", 1L)
          .otherwise(0L)).as("pc"))
        .agg(count(lit(1)).as("nu"), sum(col("pc")).as("sp"),
          sum(expr("CAST(pc AS BIGINT) * pc")).as("spp"))
      val nd = ev.agg((max(col("day")) - min(col("day")) + 1).as("nd"))
      val lifts = broadcast(Seq(50, 100, 200).toDF("lift"))
      lifts.crossJoin(broadcast(mo)).crossJoin(broadcast(nd))
        .select(col("lift").cast("long").as("lift_milli"),
          expr(s"CAST(floor($nreq) AS BIGINT)").as("users_per_arm"),
          expr(s"CAST(floor($days) AS BIGINT)").as("days_needed"))
        .orderBy(col("lift_milli"))
    }
  }
}
