package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables

/** Round-9 cohort/Lexis wave: customers cohorted by first-order year,
  * age = order year − cohort year — the classic retention triangle,
  * the 1995 cohort's revenue-per-member age curve, a two-way
  * (cohort + age) effect decomposition of retention, the Lexis
  * period-activity profile, and the new-vs-returning revenue mix.
  *
  * Scale: one fact pass builds (customer, year) activity and the
  * min-year cohort map; everything downstream lives on the ≤7×7
  * cohort×age triangle. All shares are exact integer ratios. */
object CohortQueries {

  val all: Seq[Q] = Seq(q916, q917, q918, q919, q920)

  private def sqlBase: String = """
    |ap AS (SELECT DISTINCT o_custkey AS k, year(o_orderdate) AS y
    |       FROM orders),
    |co AS (SELECT k, min(y) AS c0 FROM ap GROUP BY 1),
    |sz AS (SELECT c0, count(*) AS size FROM co GROUP BY 1),
    |tri AS (
    |  SELECT co.c0, ap.y - co.c0 AS age, count(*) AS active
    |  FROM ap JOIN co ON co.k = ap.k GROUP BY 1, 2)""".stripMargin

  private def triBase(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val ap = Tables.orders(s, dir)
      .select(col("o_custkey").as("k"), year(col("o_orderdate")).as("y"))
      .distinct().materialize()
    val co = ap.groupBy(col("k")).agg(min(col("y")).as("c0"))
      .materialize()
    val tri = ap.join(co, Seq("k"))
      .groupBy(col("c0"), (col("y") - col("c0")).as("age"))
      .agg(count(lit(1)).as("active"))
    val sz = co.groupBy(col("c0")).agg(count(lit(1)).as("size"))
    (tri, sz)
  }

  /** The cohort retention triangle (retention in milli of cohort
    * size). */
  def q916: Q = Q(
    "q916_retention_triangle",
    Some(s"""
      |WITH ${sqlBase}
      |SELECT CAST(tri.c0 AS BIGINT) AS cohort,
      |       CAST(tri.age AS BIGINT) AS age,
      |       CAST(tri.active AS BIGINT) AS n_active,
      |       CAST((1000 * tri.active) // sz.size AS BIGINT)
      |         AS retention_milli
      |FROM tri JOIN sz ON sz.c0 = tri.c0
      |ORDER BY cohort, age
      |""".stripMargin)) { (s, dir) =>
    val (tri, sz) = triBase(s, dir)
    tri.join(broadcast(sz), Seq("c0"))
      .select(col("c0").cast("long").as("cohort"),
        col("age").cast("long").as("age"),
        col("active").cast("long").as("n_active"),
        expr("CAST((1000 * active) div size AS BIGINT)")
          .as("retention_milli"))
      .orderBy(col("cohort"), col("age"))
  }

  /** The 1995 cohort's revenue-per-member age curve (cents). */
  def q917: Q = Q(
    "q917_cohort_revenue_curve",
    Some(s"""
      |WITH ${sqlBase},
      |rv AS (
      |  SELECT year(o.o_orderdate) - co.c0 AS age,
      |         sum(CAST(o.o_totalprice * 100 AS BIGINT)) AS rev
      |  FROM orders o JOIN co ON co.k = o.o_custkey
      |  WHERE co.c0 = 1995 GROUP BY 1),
      |s95 AS (SELECT size FROM sz WHERE c0 = 1995)
      |SELECT CAST(rv.age AS BIGINT) AS age,
      |       CAST(rv.rev AS BIGINT) AS revenue_cents,
      |       CAST(rv.rev // s95.size AS BIGINT)
      |         AS revenue_per_member_cents
      |FROM rv CROSS JOIN s95 ORDER BY age
      |""".stripMargin)) { (s, dir) =>
    val (_, sz) = triBase(s, dir)
    val co = Tables.orders(s, dir)
      .select(col("o_custkey").as("k"), year(col("o_orderdate")).as("y"))
      .distinct().groupBy(col("k")).agg(min(col("y")).as("c0"))
    val rv = Tables.orders(s, dir)
      .select(col("o_custkey"),
        year(col("o_orderdate")).as("oy"),
        expr("CAST(CAST(o_totalprice * 100 AS DECIMAL(38,0)) AS LONG)")
          .as("v"))
      .join(co.where(col("c0") === 1995), col("k") === col("o_custkey"))
      .groupBy((col("oy") - col("c0")).as("age"))
      .agg(sum(col("v")).as("rev"))
    val s95 = sz.where(col("c0") === 1995).select(col("size"))
    rv.crossJoin(broadcast(s95))
      .select(col("age").cast("long").as("age"),
        col("rev").cast("long").as("revenue_cents"),
        expr("CAST(rev div size AS BIGINT)")
          .as("revenue_per_member_cents"))
      .orderBy(col("age"))
  }

  /** Two-way effects on the retention triangle (ages ≥ 1, fully
    * observed cells only): grand mean + cohort and age deviations —
    * all integer milli means over the balanced sub-triangle. */
  def q918: Q = Q(
    "q918_cohort_age_effects",
    Some(s"""
      |WITH ${sqlBase},
      |rt AS (SELECT tri.c0, tri.age,
      |              (1000 * tri.active) // sz.size AS r
      |       FROM tri JOIN sz ON sz.c0 = tri.c0
      |       WHERE tri.age BETWEEN 1 AND 3 AND tri.c0 <= 1998),
      |gm AS (SELECT sum(r) // count(*) AS g FROM rt),
      |ce AS (SELECT c0, sum(r) // count(*) AS m FROM rt GROUP BY 1),
      |ae AS (SELECT age, sum(r) // count(*) AS m FROM rt GROUP BY 1),
      |ef AS (
      |  SELECT 'cohort' AS dim, CAST(c0 AS BIGINT) AS level,
      |         CAST(ce.m - gm.g AS BIGINT) AS effect_milli
      |  FROM ce CROSS JOIN gm
      |  UNION ALL
      |  SELECT 'age', CAST(age AS BIGINT),
      |         CAST(ae.m - gm.g AS BIGINT)
      |  FROM ae CROSS JOIN gm)
      |SELECT dim, level, effect_milli FROM ef ORDER BY dim, level
      |""".stripMargin)) { (s, dir) =>
    val (tri, sz) = triBase(s, dir)
    val rt = tri.join(broadcast(sz), Seq("c0"))
      .where(col("age").between(1, 3) && col("c0") <= 1998)
      .select(col("c0"), col("age"),
        expr("(1000 * active) div size").as("r"))
      .materialize()
    val gm = rt.agg(expr("sum(r) div count(*)").as("g"))
    val ce = rt.groupBy(col("c0"))
      .agg(expr("sum(r) div count(*)").as("m"))
      .crossJoin(broadcast(gm))
      .select(lit("cohort").as("dim"), col("c0").cast("long").as("level"),
        (col("m") - col("g")).cast("long").as("effect_milli"))
    val ae = rt.groupBy(col("age"))
      .agg(expr("sum(r) div count(*)").as("m"))
      .crossJoin(broadcast(gm))
      .select(lit("age").as("dim"), col("age").cast("long").as("level"),
        (col("m") - col("g")).cast("long").as("effect_milli"))
    ce.unionAll(ae).orderBy(col("dim"), col("level"))
  }

  /** Lexis period profile: active customers per calendar year and the
    * share of ever-acquired customers still active. */
  def q919: Q = Q(
    "q919_lexis_period_profile",
    Some(s"""
      |WITH ${sqlBase},
      |pa AS (SELECT y, count(*) AS act FROM ap GROUP BY 1),
      |cm AS (SELECT pa.y, pa.act,
      |              (SELECT count(*) FROM co WHERE co.c0 <= pa.y)
      |                AS acquired
      |       FROM pa)
      |SELECT CAST(y AS BIGINT) AS period,
      |       CAST(act AS BIGINT) AS n_active,
      |       CAST(acquired AS BIGINT) AS n_acquired,
      |       CAST((1000 * act) // acquired AS BIGINT)
      |         AS active_share_milli
      |FROM cm ORDER BY period
      |""".stripMargin)) { (s, dir) =>
    val ap = Tables.orders(s, dir)
      .select(col("o_custkey").as("k"), year(col("o_orderdate")).as("y"))
      .distinct().materialize()
    val co = ap.groupBy(col("k")).agg(min(col("y")).as("c0"))
    val pa = ap.groupBy(col("y")).agg(count(lit(1)).as("act"))
    val cz = co.groupBy(col("c0")).agg(count(lit(1)).as("nw"))
    val acq = pa.select(col("y")).join(broadcast(cz), col("c0") <= col("y"))
      .groupBy(col("y")).agg(sum(col("nw")).as("acquired"))
    pa.join(broadcast(acq), Seq("y"))
      .select(col("y").cast("long").as("period"),
        col("act").cast("long").as("n_active"),
        col("acquired").cast("long").as("n_acquired"),
        expr("CAST((1000 * act) div acquired AS BIGINT)")
          .as("active_share_milli"))
      .orderBy(col("period"))
  }

  /** New vs returning revenue mix per year. */
  def q920: Q = Q(
    "q920_new_vs_returning",
    Some(s"""
      |WITH ${sqlBase},
      |rv AS (
      |  SELECT year(o.o_orderdate) AS y,
      |         sum(CASE WHEN year(o.o_orderdate) = co.c0
      |             THEN CAST(o.o_totalprice * 100 AS BIGINT) ELSE 0 END)
      |           AS new_rev,
      |         sum(CASE WHEN year(o.o_orderdate) > co.c0
      |             THEN CAST(o.o_totalprice * 100 AS BIGINT) ELSE 0 END)
      |           AS ret_rev
      |  FROM orders o JOIN co ON co.k = o.o_custkey GROUP BY 1)
      |SELECT CAST(y AS BIGINT) AS period,
      |       CAST(new_rev AS BIGINT) AS new_revenue_cents,
      |       CAST(ret_rev AS BIGINT) AS returning_revenue_cents,
      |       CAST((1000 * ret_rev) // (new_rev + ret_rev) AS BIGINT)
      |         AS returning_share_milli
      |FROM rv ORDER BY period
      |""".stripMargin)) { (s, dir) =>
    val co = Tables.orders(s, dir)
      .select(col("o_custkey").as("k"), year(col("o_orderdate")).as("y"))
      .distinct().groupBy(col("k")).agg(min(col("y")).as("c0"))
    Tables.orders(s, dir)
      .select(col("o_custkey"), year(col("o_orderdate")).as("oy"),
        expr("CAST(CAST(o_totalprice * 100 AS DECIMAL(38,0)) AS LONG)")
          .as("v"))
      .join(co, col("k") === col("o_custkey"))
      .groupBy(col("oy").as("period"))
      .agg(sum(when(col("oy") === col("c0"), col("v")).otherwise(0L))
        .as("new_rev"),
        sum(when(col("oy") > col("c0"), col("v")).otherwise(0L))
          .as("ret_rev"))
      .select(col("period").cast("long").as("period"),
        col("new_rev").cast("long").as("new_revenue_cents"),
        col("ret_rev").cast("long").as("returning_revenue_cents"),
        expr("CAST((1000 * ret_rev) div (new_rev + ret_rev) AS BIGINT)")
          .as("returning_share_milli"))
      .orderBy(col("period"))
  }
}
