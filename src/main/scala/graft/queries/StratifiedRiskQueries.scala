package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-11 stratified 2×2 wave (the epidemiology panel): exposure =
  * deep discount (l_discount ≥ 0.06), event = returned line, strata =
  * brand — the Mantel–Haenszel pooled odds ratio vs the crude one
  * (confounding audit), per-stratum odds ratios, direct
  * standardization of yearly return rates to the overall brand mix,
  * indirect standardization (SMR), and the Cochran–Mantel–Haenszel
  * test.
  *
  * Exactness: every 2×2 cell is an exact count; crude/per-stratum
  * odds ratios are exact integer rationals (`div`, NULL on empty
  * denominators, stated both sides); the MH/CMH/standardization sums
  * quantize each per-stratum rational term to DECIMAL(28,6) before
  * the order-free exact sum (PSI discipline) and finish in one
  * shared-text double step.
  *
  * Scale: one lineitem scan joins the broadcast part dim and
  * collapses to the ≤25-brand (× ≤7-year) contingency dim; all
  * statistics are dim work. (MechanismQueries' q on returns under
  * deep discounts is the UNstratified crude pair; this wave is the
  * stratified completion.) */
object StratifiedRiskQueries {

  val all: Seq[Q] = Seq(q1076, q1077, q1078, q1079, q1080)

  /** Oracle per-brand 2×2 CTE: ct(br, a, b, c, d, n). */
  private def sqlCt: String = """
    |base AS (SELECT p.p_brand AS br,
    |                CASE WHEN l.l_discount >= 0.06 THEN 1 ELSE 0 END
    |                  AS ex,
    |                CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END
    |                  AS ev
    |         FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
    |ct AS (SELECT br,
    |              sum(CASE WHEN ex = 1 AND ev = 1 THEN 1 ELSE 0 END) AS a,
    |              sum(CASE WHEN ex = 1 AND ev = 0 THEN 1 ELSE 0 END) AS b,
    |              sum(CASE WHEN ex = 0 AND ev = 1 THEN 1 ELSE 0 END) AS c,
    |              sum(CASE WHEN ex = 0 AND ev = 0 THEN 1 ELSE 0 END) AS d,
    |              count(*) AS n
    |       FROM base GROUP BY 1)""".stripMargin

  /** Spark twin: per-brand 2×2 frame (br, a, b, c, d, n). */
  private def brandCt(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_partkey").as("pk"),
        // SQL-text literal so 0.06 is a DECIMAL comparison exactly as
        // in the oracle (a Scala 0.06 would compare as double)
        expr("CASE WHEN l_discount >= 0.06 THEN 1 ELSE 0 END").as("ex"),
        when(col("l_returnflag") === "R", 1).otherwise(0).as("ev"))
      .join(broadcast(Tables.part(s, dir)
        .select(col("p_partkey").as("pk"), col("p_brand").as("br"))),
        "pk")
      .groupBy(col("br"))
      .agg(sum(when(col("ex") === 1 && col("ev") === 1, 1L)
        .otherwise(0L)).as("a"),
        sum(when(col("ex") === 1 && col("ev") === 0, 1L)
          .otherwise(0L)).as("b"),
        sum(when(col("ex") === 0 && col("ev") === 1, 1L)
          .otherwise(0L)).as("c"),
        sum(when(col("ex") === 0 && col("ev") === 0, 1L)
          .otherwise(0L)).as("d"),
        count(lit(1)).as("n"))

  /** Mantel–Haenszel pooled odds ratio vs the crude one. */
  def q1076: Q = Q(
    "q1076_mantel_haenszel_or",
    Some(s"""
      |WITH ${sqlCt},
      |tm AS (SELECT
      |         CAST(CAST(a AS DOUBLE) * d / n AS DECIMAL(28,6)) AS t1,
      |         CAST(CAST(b AS DOUBLE) * c / n AS DECIMAL(28,6)) AS t2,
      |         a, b, c, d
      |       FROM ct),
      |ag AS (SELECT count(*) AS n_strata, sum(t1) AS s1, sum(t2) AS s2,
      |              sum(a) AS ta, sum(b) AS tb, sum(c) AS tc,
      |              sum(d) AS td
      |       FROM tm)
      |SELECT CAST(n_strata AS BIGINT) AS n_strata,
      |       CAST(floor(1000.0 * CAST(s1 AS DOUBLE)
      |            / CAST(s2 AS DOUBLE)) AS BIGINT) AS or_mh_milli,
      |       CAST((1000 * CAST(ta AS HUGEINT) * td)
      |            // (CAST(tb AS HUGEINT) * tc) AS BIGINT)
      |         AS or_crude_milli
      |FROM ag
      |""".stripMargin)) { (s, dir) =>
    brandCt(s, dir)
      .select(expr("CAST(CAST(a AS DOUBLE) * d / n AS DECIMAL(28,6))")
        .as("t1"),
        expr("CAST(CAST(b AS DOUBLE) * c / n AS DECIMAL(28,6))")
          .as("t2"),
        col("a"), col("b"), col("c"), col("d"))
      .agg(count(lit(1)).as("n_strata"), sum(col("t1")).as("s1"),
        sum(col("t2")).as("s2"), sum(col("a")).as("ta"),
        sum(col("b")).as("tb"), sum(col("c")).as("tc"),
        sum(col("d")).as("td"))
      .select(col("n_strata").cast("long").as("n_strata"),
        expr("CAST(floor(1000.0 * CAST(s1 AS DOUBLE)" +
          " / CAST(s2 AS DOUBLE)) AS BIGINT)").as("or_mh_milli"),
        expr("CAST((1000 * CAST(ta AS DECIMAL(38,0)) * td)" +
          " div (CAST(tb AS DECIMAL(38,0)) * tc) AS BIGINT)")
          .as("or_crude_milli"))
  }

  /** Per-stratum odds ratios (top 10 by OR). */
  def q1077: Q = Q(
    "q1077_stratum_odds_ratios",
    Some(s"""
      |WITH ${sqlCt}
      |SELECT br AS brand,
      |       CAST(a AS BIGINT) AS exposed_events,
      |       CAST(b AS BIGINT) AS exposed_ok,
      |       CAST(c AS BIGINT) AS unexposed_events,
      |       CAST(d AS BIGINT) AS unexposed_ok,
      |       CAST(CASE WHEN b * c = 0 THEN NULL
      |            ELSE (1000 * CAST(a AS HUGEINT) * d)
      |                 // (CAST(b AS HUGEINT) * c) END AS BIGINT)
      |         AS or_milli
      |FROM ct ORDER BY or_milli DESC NULLS LAST, brand LIMIT 10
      |""".stripMargin)) { (s, dir) =>
    brandCt(s, dir)
      .select(col("br").as("brand"),
        col("a").as("exposed_events"), col("b").as("exposed_ok"),
        col("c").as("unexposed_events"), col("d").as("unexposed_ok"),
        expr("CAST(CASE WHEN b * c = 0 THEN NULL" +
          " ELSE (1000 * CAST(a AS DECIMAL(38,0)) * d)" +
          " div (CAST(b AS DECIMAL(38,0)) * c) END AS BIGINT)")
          .as("or_milli"))
      .orderBy(col("or_milli").desc_nulls_last, col("brand"))
      .limit(10)
  }

  /** Oracle (year, brand) return-count CTE + brand margins:
    * yb(yr, br, ev, nn), bm(br, evb, nb). */
  private def sqlYb: String = """
    |base AS (SELECT year(CAST(l.l_shipdate AS DATE)) AS yr,
    |                p.p_brand AS br,
    |                CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END
    |                  AS ev
    |         FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
    |yb AS (SELECT yr, br, sum(ev) AS ev, count(*) AS nn
    |       FROM base GROUP BY 1, 2),
    |bm AS (SELECT br, sum(ev) AS evb, sum(nn) AS nb FROM yb GROUP BY 1),
    |gt AS (SELECT sum(nn) AS nt FROM yb)""".stripMargin

  /** Spark twin: ((year, brand) counts, brand margins, 1-row total). */
  private def yearBrand(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val yb = Tables.lineitem(s, dir)
      .select(col("l_partkey").as("pk"),
        year(col("l_shipdate").cast("date")).as("yr"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("ev"))
      .join(broadcast(Tables.part(s, dir)
        .select(col("p_partkey").as("pk"), col("p_brand").as("br"))),
        "pk")
      .groupBy(col("yr"), col("br"))
      .agg(sum(col("ev")).as("ev"), count(lit(1)).as("nn"))
    val bm = yb.groupBy(col("br"))
      .agg(sum(col("ev")).as("evb"), sum(col("nn")).as("nb"))
    val gt = yb.agg(sum(col("nn")).as("nt"))
    (yb, bm, gt)
  }

  /** Direct standardization: yearly return rate standardized to the
    * overall brand mix. */
  def q1078: Q = Q(
    "q1078_direct_standardization",
    Some(s"""
      |WITH ${sqlYb},
      |tm AS (SELECT yb.yr,
      |              CAST(CAST(bm.nb AS DOUBLE) * yb.ev / yb.nn
      |                   AS DECIMAL(28,6)) AS term,
      |              yb.ev, yb.nn
      |       FROM yb JOIN bm ON bm.br = yb.br)
      |SELECT CAST(yr AS BIGINT) AS ship_year,
      |       CAST((1000000 * sum(ev)) // sum(nn) AS BIGINT)
      |         AS crude_ppm,
      |       CAST(floor(1000000.0 * CAST(sum(term) AS DOUBLE)
      |            / (SELECT nt FROM gt)) AS BIGINT) AS std_ppm
      |FROM tm GROUP BY 1 ORDER BY ship_year
      |""".stripMargin)) { (s, dir) =>
    val (yb, bm, gt) = yearBrand(s, dir)
    yb.join(broadcast(bm), "br")
      .select(col("yr"),
        expr("CAST(CAST(nb AS DOUBLE) * ev / nn AS DECIMAL(28,6))")
          .as("term"),
        col("ev"), col("nn"))
      .groupBy(col("yr").cast("long").as("ship_year"))
      .agg(expr("CAST((1000000 * sum(ev)) div sum(nn) AS BIGINT)")
        .as("crude_ppm"), sum(col("term")).as("st"))
      .crossJoin(broadcast(gt))
      .select(col("ship_year"), col("crude_ppm"),
        expr("CAST(floor(1000000.0 * CAST(st AS DOUBLE) / nt)" +
          " AS BIGINT)").as("std_ppm"))
      .orderBy(col("ship_year"))
  }

  /** Indirect standardization: SMR per ship-year against overall
    * brand rates. */
  def q1079: Q = Q(
    "q1079_smr_by_year",
    Some(s"""
      |WITH ${sqlYb},
      |tm AS (SELECT yb.yr, yb.ev,
      |              CAST(CAST(yb.nn AS DOUBLE) * bm.evb / bm.nb
      |                   AS DECIMAL(28,6)) AS ee
      |       FROM yb JOIN bm ON bm.br = yb.br)
      |SELECT CAST(yr AS BIGINT) AS ship_year,
      |       CAST(sum(ev) AS BIGINT) AS observed,
      |       CAST(floor(1000.0 * CAST(sum(ee) AS DOUBLE)) AS BIGINT)
      |         AS expected_milli,
      |       CAST(floor(1000.0 * sum(ev) / CAST(sum(ee) AS DOUBLE))
      |            AS BIGINT) AS smr_milli
      |FROM tm GROUP BY 1 ORDER BY ship_year
      |""".stripMargin)) { (s, dir) =>
    val (yb, bm, _) = yearBrand(s, dir)
    yb.join(broadcast(bm), "br")
      .select(col("yr"), col("ev"),
        expr("CAST(CAST(nn AS DOUBLE) * evb / nb AS DECIMAL(28,6))")
          .as("ee"))
      .groupBy(col("yr").cast("long").as("ship_year"))
      .agg(sum(col("ev")).cast("long").as("observed"),
        sum(col("ee")).as("se"))
      .select(col("ship_year"), col("observed"),
        expr("CAST(floor(1000.0 * CAST(se AS DOUBLE)) AS BIGINT)")
          .as("expected_milli"),
        expr("CAST(floor(1000.0 * observed / CAST(se AS DOUBLE))" +
          " AS BIGINT)").as("smr_milli"))
      .orderBy(col("ship_year"))
  }

  /** Cochran–Mantel–Haenszel chi-square across the brand strata. */
  def q1080: Q = Q(
    "q1080_cmh_test",
    Some(s"""
      |WITH ${sqlCt},
      |tm AS (SELECT a,
      |         CAST(CAST(a + b AS DOUBLE) * (a + c) / n
      |              AS DECIMAL(28,6)) AS e,
      |         CAST(CAST(a + b AS DOUBLE) * (c + d) * (a + c) * (b + d)
      |              / (CAST(n AS DOUBLE) * n * (n - 1))
      |              AS DECIMAL(28,6)) AS v
      |       FROM ct WHERE n > 1)
      |SELECT CAST(count(*) AS BIGINT) AS n_strata,
      |       CAST(sum(a) AS BIGINT) AS sum_exposed_events,
      |       CAST(floor(1000.0 * CAST(sum(e) AS DOUBLE)) AS BIGINT)
      |         AS expected_milli,
      |       CAST(floor(1000.0 * (CAST(sum(a) AS DOUBLE)
      |              - CAST(sum(e) AS DOUBLE))
      |            * (CAST(sum(a) AS DOUBLE) - CAST(sum(e) AS DOUBLE))
      |            / CAST(sum(v) AS DOUBLE)) AS BIGINT) AS cmh_milli
      |FROM tm
      |""".stripMargin)) { (s, dir) =>
    brandCt(s, dir).where(col("n") > 1)
      .select(col("a"),
        expr("CAST(CAST(a + b AS DOUBLE) * (a + c) / n" +
          " AS DECIMAL(28,6))").as("e"),
        expr("CAST(CAST(a + b AS DOUBLE) * (c + d) * (a + c) * (b + d)" +
          " / (CAST(n AS DOUBLE) * n * (n - 1)) AS DECIMAL(28,6))")
          .as("v"))
      .agg(count(lit(1)).cast("long").as("n_strata"),
        sum(col("a")).cast("long").as("sum_exposed_events"),
        expr("CAST(floor(1000.0 * CAST(sum(e) AS DOUBLE)) AS BIGINT)")
          .as("expected_milli"),
        expr("CAST(floor(1000.0 * (CAST(sum(a) AS DOUBLE)" +
          " - CAST(sum(e) AS DOUBLE))" +
          " * (CAST(sum(a) AS DOUBLE) - CAST(sum(e) AS DOUBLE))" +
          " / CAST(sum(v) AS DOUBLE)) AS BIGINT)").as("cmh_milli"))
  }
}
