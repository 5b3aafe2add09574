package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Materialize.MatOps
import graft.Tables

/** Round-9 first-passage wave on the event stream (epoch-nano ts, the
  * established events contract): view→purchase first-passage times,
  * the full ordered type-pair first-passage matrix, the steps-to-
  * convert histogram, per-type inter-event dwell, and the inter-event
  * gap-bucket (burst) profile.
  *
  * Scale: everything is per-user windows/aggregates (partitioned by
  * user_id — scale-safe) plus type-dim joins; all times are exact
  * integer nanosecond differences floored to seconds. */
object FirstPassageQueries {

  val all: Seq[Q] = Seq(q936, q937, q938, q939, q940)

  private def sqlEv: String = """
    |ev AS (SELECT user_id AS u, epoch_ns(ts) AS t, event_id AS eid,
    |              event_type AS ty
    |       FROM events)""".stripMargin

  private def evBase(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("user_id").as("u"), col("ts").as("t"),
        col("event_id").as("eid"), col("event_type").as("ty"))

  /** First-passage view→purchase: per user the first view and the
    * first later purchase — converted count, mean/min/max seconds. */
  def q936: Q = Q(
    "q936_first_passage_vp",
    Some(s"""
      |WITH ${sqlEv},
      |fv AS (SELECT u, min(t) AS tv FROM ev WHERE ty = 'view'
      |       GROUP BY 1),
      |fp AS (SELECT ev.u, min(ev.t) AS tp
      |       FROM ev JOIN fv ON fv.u = ev.u
      |       WHERE ev.ty = 'purchase' AND ev.t > fv.tv GROUP BY 1),
      |sp AS (SELECT (fp.tp - fv.tv) // 1000000000 AS sec
      |       FROM fp JOIN fv ON fv.u = fp.u)
      |SELECT CAST(count(*) AS BIGINT) AS n_converted,
      |       CAST(sum(CAST(sec AS HUGEINT)) // count(*) AS BIGINT)
      |         AS mean_seconds,
      |       CAST(min(sec) AS BIGINT) AS min_seconds,
      |       CAST(max(sec) AS BIGINT) AS max_seconds
      |FROM sp
      |""".stripMargin)) { (s, dir) =>
    val ev = evBase(s, dir).materialize()
    val fv = ev.where(col("ty") === "view")
      .groupBy(col("u")).agg(min(col("t")).as("tv"))
    val fp = ev.where(col("ty") === "purchase")
      .join(fv, Seq("u")).where(col("t") > col("tv"))
      .groupBy(col("u"), col("tv")).agg(min(col("t")).as("tp"))
    fp.select(expr("(tp - tv) div 1000000000").as("sec"))
      .agg(count(lit(1)).as("n"),
        sum(col("sec").cast("decimal(38,0)")).as("ss"),
        min(col("sec")).as("mn"), max(col("sec")).as("mx"))
      .select(col("n").cast("long").as("n_converted"),
        expr("CAST((ss - ss % n) / n AS DECIMAL(38,0))").cast("long")
          .as("mean_seconds"),
        col("mn").cast("long").as("min_seconds"),
        col("mx").cast("long").as("max_seconds"))
  }

  /** Ordered type-pair first-passage matrix: mean seconds from each
    * user's first FROM-event to their first later TO-event. */
  def q937: Q = Q(
    "q937_passage_matrix",
    Some(s"""
      |WITH ${sqlEv},
      |ft AS (SELECT u, ty, min(t) AS t0 FROM ev GROUP BY 1, 2),
      |fp AS (
      |  SELECT ft.ty AS ty_from, ev.ty AS ty_to, ft.u,
      |         min(ev.t) AS t1, any_value(ft.t0) AS t0
      |  FROM ev JOIN ft ON ft.u = ev.u AND ev.ty != ft.ty
      |       AND ev.t > ft.t0
      |  GROUP BY 1, 2, 3)
      |SELECT ty_from, ty_to, CAST(count(*) AS BIGINT) AS n_users,
      |       CAST(sum(CAST((t1 - t0) // 1000000000 AS HUGEINT))
      |            // count(*) AS BIGINT) AS mean_seconds
      |FROM fp GROUP BY 1, 2 ORDER BY ty_from, ty_to
      |""".stripMargin)) { (s, dir) =>
    val ev = evBase(s, dir).materialize()
    val ft = ev.groupBy(col("u"), col("ty")).agg(min(col("t")).as("t0"))
    val fp = ev.select(col("u").as("u2"), col("ty").as("ty_to"),
        col("t"))
      .join(ft.select(col("u"), col("ty").as("ty_from"), col("t0")),
        col("u2") === col("u") && col("ty_to") =!= col("ty_from")
          && col("t") > col("t0"))
      .groupBy(col("ty_from"), col("ty_to"), col("u"))
      .agg(min(col("t")).as("t1"), first(col("t0")).as("t0v"))
    fp.groupBy(col("ty_from"), col("ty_to"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST((t1 - t0v) div 1000000000 AS DECIMAL(38,0))"))
          .as("ss"))
      .select(col("ty_from"), col("ty_to"),
        col("n").cast("long").as("n_users"),
        expr("CAST((ss - ss % n) / n AS DECIMAL(38,0))").cast("long")
          .as("mean_seconds"))
      .orderBy(col("ty_from"), col("ty_to"))
  }

  /** Steps-to-convert: events strictly between the first view and the
    * first later purchase, capped histogram (10+ bucket). */
  def q938: Q = Q(
    "q938_steps_to_convert",
    Some(s"""
      |WITH ${sqlEv},
      |fv AS (SELECT u, min(t) AS tv FROM ev WHERE ty = 'view'
      |       GROUP BY 1),
      |fp AS (SELECT ev.u, min(ev.t) AS tp
      |       FROM ev JOIN fv ON fv.u = ev.u
      |       WHERE ev.ty = 'purchase' AND ev.t > fv.tv GROUP BY 1),
      |st AS (
      |  SELECT fp.u, count(ev.eid) AS steps
      |  FROM fp JOIN fv ON fv.u = fp.u
      |  LEFT JOIN ev ON ev.u = fp.u AND ev.t > fv.tv AND ev.t < fp.tp
      |  GROUP BY 1)
      |SELECT CAST(least(steps, 10) AS BIGINT) AS steps_capped,
      |       CAST(count(*) AS BIGINT) AS n_users
      |FROM st GROUP BY 1 ORDER BY steps_capped
      |""".stripMargin)) { (s, dir) =>
    val ev = evBase(s, dir).materialize()
    val fv = ev.where(col("ty") === "view")
      .groupBy(col("u")).agg(min(col("t")).as("tv"))
    val fp = ev.where(col("ty") === "purchase")
      .join(fv, Seq("u")).where(col("t") > col("tv"))
      .groupBy(col("u"), col("tv")).agg(min(col("t")).as("tp"))
    val st = fp.join(
      ev.select(col("u").as("u2"), col("t").as("te"), col("eid")),
      col("u2") === col("u") && col("te") > col("tv")
        && col("te") < col("tp"), "left")
      .groupBy(col("u")).agg(count(col("eid")).as("steps"))
    st.groupBy(least(col("steps"), lit(10)).as("steps_capped"))
      .agg(count(lit(1)).as("n"))
      .select(col("steps_capped").cast("long").as("steps_capped"),
        col("n").cast("long").as("n_users"))
      .orderBy(col("steps_capped"))
  }

  /** Per-type inter-event dwell: consecutive same-type gaps within a
    * user, mean seconds per type. */
  def q939: Q = Q(
    "q939_dwell_by_type",
    Some(s"""
      |WITH ${sqlEv},
      |gp AS (
      |  SELECT ty, (t - lag(t) OVER w) // 1000000000 AS sec
      |  FROM ev WINDOW w AS (PARTITION BY u, ty ORDER BY t, eid)
      |  QUALIFY sec IS NOT NULL)
      |SELECT ty AS event_type, CAST(count(*) AS BIGINT) AS n_gaps,
      |       CAST(sum(CAST(sec AS HUGEINT)) // count(*) AS BIGINT)
      |         AS mean_gap_seconds
      |FROM gp GROUP BY 1 ORDER BY event_type
      |""".stripMargin)) { (s, dir) =>
    val w = Window.partitionBy(col("u"), col("ty"))
      .orderBy(col("t"), col("eid"))
    evBase(s, dir)
      .select(col("ty"),
        expr("(t - lag(t) OVER (PARTITION BY u, ty ORDER BY t, eid))" +
          " div 1000000000").as("sec"))
      .where(col("sec").isNotNull)
      .groupBy(col("ty").as("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("sec").cast("decimal(38,0)")).as("ss"))
      .select(col("event_type"), col("n").cast("long").as("n_gaps"),
        expr("CAST((ss - ss % n) / n AS DECIMAL(38,0))").cast("long")
          .as("mean_gap_seconds"))
      .orderBy(col("event_type"))
  }

  /** Inter-event gap buckets (any type, per user): under an hour,
    * hour-to-day, over a day — counts and shares. */
  def q940: Q = Q(
    "q940_gap_buckets",
    Some(s"""
      |WITH ${sqlEv},
      |gp AS (
      |  SELECT (t - lag(t) OVER w) // 1000000000 AS sec
      |  FROM ev WINDOW w AS (PARTITION BY u ORDER BY t, eid)
      |  QUALIFY sec IS NOT NULL),
      |bk AS (SELECT CASE WHEN sec < 3600 THEN 'a_under_1h'
      |              WHEN sec < 86400 THEN 'b_1h_to_1d'
      |              ELSE 'c_over_1d' END AS bucket FROM gp),
      |tt AS (SELECT count(*) AS n FROM bk)
      |SELECT bucket, CAST(count(*) AS BIGINT) AS n_gaps,
      |       CAST((1000 * count(*)) // (SELECT n FROM tt) AS BIGINT)
      |         AS share_milli
      |FROM bk GROUP BY 1 ORDER BY bucket
      |""".stripMargin)) { (s, dir) =>
    val gp = evBase(s, dir)
      .select(expr("(t - lag(t) OVER (PARTITION BY u ORDER BY t, eid))" +
        " div 1000000000").as("sec"))
      .where(col("sec").isNotNull)
      .select(when(col("sec") < 3600, "a_under_1h")
        .when(col("sec") < 86400, "b_1h_to_1d")
        .otherwise("c_over_1d").as("bucket"))
      .materialize()
    val tt = gp.agg(count(lit(1)).as("n"))
    gp.groupBy(col("bucket")).agg(count(lit(1)).as("ng"))
      .crossJoin(broadcast(tt))
      .select(col("bucket"), col("ng").cast("long").as("n_gaps"),
        expr("CAST((1000 * ng) div n AS BIGINT)").as("share_milli"))
      .orderBy(col("bucket"))
  }
}
