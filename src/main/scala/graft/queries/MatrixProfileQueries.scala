package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Materialize.MatOps
import graft.Tables

/** Round-9 matrix-profile wave: the exact (brute-force) matrix
  * profile of the daily-revenue series with subsequence length 7 and
  * a ±7 exclusion zone — profile summary, the top motif pair, the
  * top discord day, lag-k self-similarity, and the novelty-rate
  * audit against the median profile value.
  *
  * Scale: the day series is CALENDAR-bounded, so the window-pair
  * frame (~6M pairs × 7 integer terms) is CONSTANT-size at every sf —
  * the same legitimacy argument as the q846 Sn pair frame. All
  * distances are exact integer cents²; ties break on (t, s) — the
  * nearest-neighbor argmin uses the integer key dist·4096+s (the day
  * index is calendar-bounded < 4096, so the key is lexicographic). */
object MatrixProfileQueries {

  val all: Seq[Q] = Seq(q956, q957, q958, q959, q960)

  /** Oracle window CTEs: wd(t, z0..z6) 7-day subsequences. */
  private def sqlWd: String = """
    |day AS (SELECT CAST(l_shipdate AS DATE) AS d,
    |               sum(CAST(l_extendedprice * 100 AS BIGINT)) AS z
    |        FROM lineitem GROUP BY 1),
    |sq AS (SELECT row_number() OVER (ORDER BY d) AS t, z FROM day),
    |wd AS (
    |  SELECT t, z AS z0, lead(z, 1) OVER w AS z1, lead(z, 2) OVER w
    |           AS z2, lead(z, 3) OVER w AS z3, lead(z, 4) OVER w AS z4,
    |         lead(z, 5) OVER w AS z5, lead(z, 6) OVER w AS z6
    |  FROM sq WINDOW w AS (ORDER BY t)
    |  QUALIFY z6 IS NOT NULL)""".stripMargin

  private def dSql(a: String, b: String): String =
    (0 to 6).map(k =>
      s"CAST($a.z$k - $b.z$k AS HUGEINT) * ($a.z$k - $b.z$k)")
      .mkString(" + ")

  /** Spark window frame (t, z0..z6). */
  private def wdBase(s: SparkSession, dir: String): DataFrame = {
    val sq = Tables.lineitem(s, dir)
      .select(col("l_shipdate").cast("date").as("d"),
        expr("CAST(CAST(l_extendedprice * 100 AS DECIMAL(38,0)) AS LONG)")
          .as("v"))
      .groupBy(col("d")).agg(sum(col("v")).as("z"))
      .select(row_number().over(Window.orderBy(col("d"))).as("t"),
        col("z"))
    val w = Window.orderBy(col("t"))
    val withLeads = (1 to 6).foldLeft(
      sq.withColumnRenamed("z", "z0")) { (df, k) =>
      df.withColumn(s"z$k", lead(col("z0"), k).over(w))
    }
    withLeads.where(col("z6").isNotNull)
  }

  private def dSparkSql: String =
    (0 to 6).map(k =>
      s"CAST(z$k - b$k AS DECIMAL(38,0)) * (z$k - b$k)")
      .mkString(" + ")

  /** Spark pair frame (t, s, dist) with the ±7 exclusion zone.
    * d(t,s) = d(s,t), so only the s ≥ t+7 half is COMPUTED (3.1M
    * distance evaluations); the mirror is a free projection of the
    * materialized half — halves the dominant cost of the profile. */
  private def prBase(wd: DataFrame): DataFrame = {
    val b = wd.select(Seq(col("t").as("s")) ++
      (0 to 6).map(k => col(s"z$k").as(s"b$k")): _*)
    val half = wd.join(b, col("s") - col("t") >= 7)
      .select(col("t"), col("s"), expr(dSparkSql).as("dist"))
      .materialize()
    half.unionAll(half.select(col("s").as("t"), col("t").as("s"),
      col("dist")))
  }

  /** Spark per-window profile (t, p = min dist, s_best). */
  private def profBase(wd: DataFrame): DataFrame =
    prBase(wd).groupBy(col("t"))
      .agg(min(col("dist")).as("p"),
        min_by(col("s"), col("dist") * 4096 + col("s")).as("sb"))

  private def sqlProf: String = s"""
    |pr AS (
    |  SELECT a.t, b.t AS s, ${dSql("a", "b")} AS dist
    |  FROM wd a JOIN wd b ON abs(b.t - a.t) >= 7),
    |prof AS (
    |  SELECT t, min(dist) AS p,
    |         min_by(s, dist * 4096 + s) AS sb
    |  FROM pr GROUP BY 1)""".stripMargin

  /** Matrix-profile summary: windows, min/mean/max profile value. */
  def q956: Q = Q(
    "q956_matrix_profile_summary",
    Some(s"""
      |WITH ${sqlWd},${sqlProf}
      |SELECT CAST(count(*) AS BIGINT) AS n_windows,
      |       CAST(min(p) AS BIGINT) AS min_profile,
      |       CAST(sum(CAST(p AS HUGEINT)) // count(*) AS BIGINT)
      |         AS mean_profile,
      |       CAST(max(p) AS BIGINT) AS max_profile
      |FROM prof
      |""".stripMargin)) { (s, dir) =>
    profBase(wdBase(s, dir))
      .agg(count(lit(1)).as("n"), min(col("p")).as("mn"),
        sum(col("p").cast("decimal(38,0)")).as("sp"),
        max(col("p")).as("mx"))
      .select(col("n").cast("long").as("n_windows"),
        col("mn").cast("long").as("min_profile"),
        expr("CAST((sp - sp % n) / n AS DECIMAL(38,0))").cast("long")
          .as("mean_profile"),
        col("mx").cast("long").as("max_profile"))
  }

  /** Top motif: the closest non-overlapping window pair. */
  def q957: Q = Q(
    "q957_top_motif",
    Some(s"""
      |WITH ${sqlWd},
      |pr AS (
      |  SELECT a.t, b.t AS s, ${dSql("a", "b")} AS dist
      |  FROM wd a JOIN wd b ON b.t - a.t >= 7)
      |SELECT CAST(t AS BIGINT) AS motif_t,
      |       CAST(s AS BIGINT) AS motif_s,
      |       CAST(dist AS BIGINT) AS dist_cents2
      |FROM pr ORDER BY dist, t, s LIMIT 1
      |""".stripMargin)) { (s, dir) =>
    val wd = wdBase(s, dir)
    val b = wd.select(Seq(col("t").as("s")) ++
      (0 to 6).map(k => col(s"z$k").as(s"b$k")): _*)
    wd.join(b, col("s") - col("t") >= 7)
      .select(col("t"), col("s"), expr(dSparkSql).as("dist"))
      .orderBy(col("dist"), col("t"), col("s")).limit(1)
      .select(col("t").cast("long").as("motif_t"),
        col("s").cast("long").as("motif_s"),
        col("dist").cast("long").as("dist_cents2"))
  }

  /** Top discord: the window farthest from its nearest neighbor. */
  def q958: Q = Q(
    "q958_top_discord",
    Some(s"""
      |WITH ${sqlWd},${sqlProf}
      |SELECT CAST(t AS BIGINT) AS discord_t,
      |       CAST(p AS BIGINT) AS nn_dist_cents2,
      |       CAST(sb AS BIGINT) AS nearest_s
      |FROM prof ORDER BY p DESC, t LIMIT 1
      |""".stripMargin)) { (s, dir) =>
    profBase(wdBase(s, dir))
      .orderBy(col("p").desc, col("t")).limit(1)
      .select(col("t").cast("long").as("discord_t"),
        col("p").cast("long").as("nn_dist_cents2"),
        col("sb").cast("long").as("nearest_s"))
  }

  /** Lag-k self-similarity: mean window distance at lags 7/30/365. */
  def q959: Q = Q(
    "q959_lag_self_similarity",
    Some(s"""
      |WITH ${sqlWd},
      |lg AS (SELECT * FROM (VALUES (7),(30),(365)) v(lag)),
      |ld AS (
      |  SELECT lg.lag, ${dSql("a", "b")} AS dist
      |  FROM lg JOIN wd a ON 1 = 1 JOIN wd b ON b.t = a.t + lg.lag)
      |SELECT CAST(lag AS BIGINT) AS lag_days,
      |       CAST(count(*) AS BIGINT) AS n_pairs,
      |       CAST(sum(CAST(dist AS HUGEINT)) // count(*) AS BIGINT)
      |         AS mean_dist_cents2
      |FROM ld GROUP BY 1 ORDER BY lag_days
      |""".stripMargin)) { (s, dir) =>
    val wd = wdBase(s, dir).materialize()
    val lg = s.createDataFrame(Seq(7, 30, 365).map(Tuple1(_))).toDF("lag")
    val b = wd.select(Seq(col("t").as("s")) ++
      (0 to 6).map(k => col(s"z$k").as(s"b$k")): _*)
    broadcast(lg).join(wd, lit(true))
      .join(b, col("s") === col("t") + col("lag"))
      .select(col("lag"), expr(dSparkSql).as("dist"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n"),
        sum(col("dist").cast("decimal(38,0)")).as("sd"))
      .select(col("lag").cast("long").as("lag_days"),
        col("n").cast("long").as("n_pairs"),
        expr("CAST((sd - sd % n) / n AS DECIMAL(38,0))").cast("long")
          .as("mean_dist_cents2"))
      .orderBy(col("lag_days"))
  }

  /** Novelty rate: share of windows whose profile value exceeds twice
    * the median profile (exact ECDF median over the profile dim). */
  def q960: Q = Q(
    "q960_novelty_rate",
    Some(s"""
      |WITH ${sqlWd},${sqlProf},
      |vc AS (SELECT p AS val, sum(c) OVER (ORDER BY p) AS cum FROM
      |  (SELECT p, count(*) AS c FROM prof GROUP BY 1)),
      |gl AS (SELECT count(*) AS n FROM prof),
      |md AS (SELECT min(val) AS m FROM vc CROSS JOIN gl
      |       WHERE 2 * cum >= gl.n)
      |SELECT CAST(md.m AS BIGINT) AS median_profile,
      |       CAST(sum(CASE WHEN prof.p > 2 * md.m THEN 1 ELSE 0 END)
      |            AS BIGINT) AS n_novel,
      |       CAST((1000 * sum(CASE WHEN prof.p > 2 * md.m THEN 1
      |            ELSE 0 END)) // count(*) AS BIGINT) AS novel_milli
      |FROM prof CROSS JOIN md GROUP BY md.m
      |""".stripMargin)) { (s, dir) =>
    val prof = profBase(wdBase(s, dir)).materialize()
    val gl = prof.agg(count(lit(1)).as("n"))
    val md = prof.groupBy(col("p").as("val")).agg(count(lit(1)).as("c"))
      .select(col("val"),
        sum(col("c")).over(Window.orderBy(col("val"))).as("cum"))
      .crossJoin(broadcast(gl))
      .where(col("cum") * 2 >= col("n"))
      .agg(min(col("val")).as("m"))
    prof.crossJoin(broadcast(md))
      .groupBy(col("m"))
      .agg(sum(when(col("p") > col("m") * 2, 1).otherwise(0)).as("nv"),
        count(lit(1)).as("nw"))
      .select(col("m").cast("long").as("median_profile"),
        col("nv").cast("long").as("n_novel"),
        expr("CAST((1000 * nv) div nw AS BIGINT)").as("novel_milli"))
  }
}
