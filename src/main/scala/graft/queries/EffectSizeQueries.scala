package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables
import graft.dedup.SortedNeighborhood

/** Round-9 ordinal effect-size wave: Cliff's δ, Vargha-Delaney Â,
  * and the Mann-Whitney rank-biserial — all through the merged
  * value-histogram U-statistic identity (2U = 2·wins + ties), never a
  * group×group pair join — plus the 2×2 epidemiology battery
  * (OR/RR/risk difference/NNT) and the Goodman-Kruskal λ + Theil's U
  * nominal-association pair.
  *
  * Scale: the U statistic reduces to Σ_v c_A(v)·(2·cumB_below + ties)
  * over the merged distinct-value histogram; the exclusive B-cum
  * rides the bucket-parallel [[SortedNeighborhood.globalRankCums]]
  * spine. Contingency statistics are exact integers over the 5×5
  * dim; ln terms use the DECIMAL(18,9) discipline. */
object EffectSizeQueries {

  val all: Seq[Q] = Seq(q871, q872, q873, q874, q875)

  /** Spark U-stat aggregate (na, nb, u2 = 2·wins + ties) for a frame
    * (v, g) with g ∈ {0 = A, 1 = B}: P(A > B) = u2/(2·na·nb). */
  private def u2Base(vals: DataFrame): DataFrame = {
    val vc = vals.groupBy(col("v"))
      .agg(sum(when(col("g") === 0, 1).otherwise(0)).as("ca"),
        sum(when(col("g") === 1, 1).otherwise(0)).as("cb"))
      .withColumn("vb", expr("v div 1000000"))
    SortedNeighborhood.globalRankCums(vc, "v", "vb", Seq.empty,
        cumCols = Seq("ca", "cb"))
      .select(col("ca"), col("cb"),
        (col("__cum_cb") - col("cb")).as("cbBelow"))
      .agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
        sum(col("ca").cast("decimal(38,0)")
          * (col("cbBelow").cast("decimal(38,0)") * 2 + col("cb")))
          .as("u2"))
  }

  /** Oracle U-stat CTEs over a prepared `vals(v, g)` relation. */
  private def sqlU2: String = """
    |vc AS (SELECT v, sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS ca,
    |              sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS cb
    |       FROM vals GROUP BY 1),
    |cm AS (SELECT ca, cb,
    |              sum(cb) OVER (ORDER BY v) - cb AS cbBelow FROM vc),
    |uu AS (SELECT sum(ca) AS na, sum(cb) AS nb,
    |              sum(CAST(ca AS HUGEINT)
    |                  * (2 * CAST(cbBelow AS HUGEINT) + cb)) AS u2
    |       FROM cm)""".stripMargin

  private def sizeClass(deltaAbsMilli: String): String =
    s"""CASE WHEN $deltaAbsMilli < 147 THEN 'negligible'
       |     WHEN $deltaAbsMilli < 330 THEN 'small'
       |     WHEN $deltaAbsMilli < 474 THEN 'medium'
       |     ELSE 'large' END""".stripMargin

  /** Cliff's δ between BUILDING and AUTOMOBILE order values:
    * δ = (2U − nm)/nm with U = wins + ties/2. */
  def q871: Q = Q(
    "q871_cliffs_delta",
    Some(s"""
      |WITH vals AS (
      |  SELECT CAST(o.o_totalprice * 100 AS BIGINT) AS v,
      |         CASE WHEN c.c_mktsegment = 'BUILDING' THEN 0 ELSE 1 END
      |           AS g
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |  WHERE c.c_mktsegment IN ('BUILDING', 'AUTOMOBILE')),
      |${sqlU2}
      |SELECT CAST(na AS BIGINT) AS n_building,
      |       CAST(nb AS BIGINT) AS n_automobile,
      |       CAST((1000 * (u2 - na * nb)) // (na * nb) AS BIGINT)
      |         AS cliffs_delta_milli,
      |       ${sizeClass("abs((1000 * (u2 - na * nb)) // (na * nb))")}
      |         AS magnitude
      |FROM uu
      |""".stripMargin)) { (s, dir) =>
    val vals = Tables.orders(s, dir)
      .select(col("o_custkey"),
        expr("CAST(CAST(o_totalprice * 100 AS DECIMAL(38,0)) AS LONG)")
          .as("v"))
      .join(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment").as("seg")),
        col("c_custkey") === col("o_custkey"))
      .where(col("seg").isin("BUILDING", "AUTOMOBILE"))
      .select(col("v"), when(col("seg") === "BUILDING", 0).otherwise(1)
        .as("g"))
    u2Base(vals)
      .select(col("na").cast("long").as("n_building"),
        col("nb").cast("long").as("n_automobile"),
        expr("CAST((1000 * (u2 - na * nb)) div (na * nb) AS BIGINT)")
          .as("cliffs_delta_milli"),
        expr(sizeClass(
          "abs((1000 * (u2 - na * nb)) div (na * nb))")).as("magnitude"))
  }

  /** Vargha-Delaney Â between R-flagged and N-flagged lineitem
    * prices: Â = U/(nm) = P(A > B) + ½P(A = B). */
  def q872: Q = Q(
    "q872_vargha_delaney_a",
    Some(s"""
      |WITH vals AS (
      |  SELECT CAST(l_extendedprice * 100 AS BIGINT) AS v,
      |         CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END AS g
      |  FROM lineitem WHERE l_returnflag IN ('R', 'N')),
      |${sqlU2}
      |SELECT CAST(na AS BIGINT) AS n_returned,
      |       CAST(nb AS BIGINT) AS n_kept,
      |       CAST((1000 * u2) // (2 * na * nb) AS BIGINT) AS a_milli
      |FROM uu
      |""".stripMargin)) { (s, dir) =>
    val vals = Tables.lineitem(s, dir)
      .where(col("l_returnflag").isin("R", "N"))
      .select(expr("CAST(CAST(l_extendedprice * 100 AS DECIMAL(38,0))" +
        " AS LONG)").as("v"),
        when(col("l_returnflag") === "R", 0).otherwise(1).as("g"))
    u2Base(vals)
      .select(col("na").cast("long").as("n_returned"),
        col("nb").cast("long").as("n_kept"),
        expr("CAST((1000 * u2) div (2 * na * nb) AS BIGINT)")
          .as("a_milli"))
  }

  /** Mann-Whitney rank-biserial between URGENT and LOW priority
    * order values: r = 2U/(nm) − 1. */
  def q873: Q = Q(
    "q873_rank_biserial",
    Some(s"""
      |WITH vals AS (
      |  SELECT CAST(o_totalprice * 100 AS BIGINT) AS v,
      |         CASE WHEN o_orderpriority = '1-URGENT' THEN 0 ELSE 1 END
      |           AS g
      |  FROM orders
      |  WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
      |${sqlU2}
      |SELECT CAST(na AS BIGINT) AS n_urgent,
      |       CAST(nb AS BIGINT) AS n_low,
      |       CAST((1000 * (u2 - na * nb)) // (na * nb) AS BIGINT)
      |         AS rank_biserial_milli
      |FROM uu
      |""".stripMargin)) { (s, dir) =>
    val vals = Tables.orders(s, dir)
      .where(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select(expr("CAST(CAST(o_totalprice * 100 AS DECIMAL(38,0))" +
        " AS LONG)").as("v"),
        when(col("o_orderpriority") === "1-URGENT", 0).otherwise(1)
          .as("g"))
    u2Base(vals)
      .select(col("na").cast("long").as("n_urgent"),
        col("nb").cast("long").as("n_low"),
        expr("CAST((1000 * (u2 - na * nb)) div (na * nb) AS BIGINT)")
          .as("rank_biserial_milli"))
  }

  /** 2×2 battery — exposure: URGENT priority; outcome: order value
    * above the global median (exact ECDF cut). OR, RR, risk
    * difference, NNT — all exact integer rationals. */
  def q874: Q = Q(
    "q874_odds_risk_battery",
    Some("""
      |WITH x AS (
      |  SELECT CAST(o_totalprice * 100 AS BIGINT) AS v,
      |         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
      |           AS e
      |  FROM orders),
      |gl AS (SELECT count(*) AS n FROM x),
      |vc AS (SELECT v AS val, sum(c) OVER (ORDER BY v) AS cum FROM
      |  (SELECT v, count(*) AS c FROM x GROUP BY 1)),
      |md AS (SELECT min(val) AS m FROM vc CROSS JOIN gl
      |       WHERE 2 * cum >= gl.n),
      |ct AS (SELECT
      |  sum(CASE WHEN e = 1 AND v > md.m THEN 1 ELSE 0 END) AS a,
      |  sum(CASE WHEN e = 1 AND v <= md.m THEN 1 ELSE 0 END) AS b,
      |  sum(CASE WHEN e = 0 AND v > md.m THEN 1 ELSE 0 END) AS c,
      |  sum(CASE WHEN e = 0 AND v <= md.m THEN 1 ELSE 0 END) AS d
      |  FROM x CROSS JOIN md)
      |SELECT CAST(a AS BIGINT) AS n_exp_hi, CAST(b AS BIGINT) AS n_exp_lo,
      |       CAST(c AS BIGINT) AS n_ctl_hi, CAST(d AS BIGINT) AS n_ctl_lo,
      |       CAST((1000 * a * d) // (b * c) AS BIGINT) AS odds_ratio_milli,
      |       CAST((1000 * a * (c + d)) // (c * (a + b)) AS BIGINT)
      |         AS relative_risk_milli,
      |       CAST((1000000 * a) // (a + b) - (1000000 * c) // (c + d)
      |            AS BIGINT) AS risk_diff_micro
      |FROM ct
      |""".stripMargin)) { (s, dir) =>
    val x = Tables.orders(s, dir)
      .select(expr("CAST(CAST(o_totalprice * 100 AS DECIMAL(38,0))" +
        " AS LONG)").as("v"),
        when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0)
          .as("e")).materialize()
    val gl = x.agg(count(lit(1)).as("n"))
    val md = x.groupBy(col("v").as("val")).agg(count(lit(1)).as("c"))
      .select(col("val"), sum(col("c")).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("val")))
        .as("cum"))
      .crossJoin(broadcast(gl))
      .where(col("cum") * 2 >= col("n"))
      .agg(min(col("val")).as("m"))
    x.crossJoin(broadcast(md))
      .agg(sum(when(col("e") === 1 && col("v") > col("m"), 1)
        .otherwise(0)).as("a"),
        sum(when(col("e") === 1 && col("v") <= col("m"), 1)
          .otherwise(0)).as("b"),
        sum(when(col("e") === 0 && col("v") > col("m"), 1)
          .otherwise(0)).as("c"),
        sum(when(col("e") === 0 && col("v") <= col("m"), 1)
          .otherwise(0)).as("d"))
      .select(col("a").cast("long").as("n_exp_hi"),
        col("b").cast("long").as("n_exp_lo"),
        col("c").cast("long").as("n_ctl_hi"),
        col("d").cast("long").as("n_ctl_lo"),
        expr("CAST((1000 * a * d) div (b * c) AS BIGINT)")
          .as("odds_ratio_milli"),
        expr("CAST((1000 * a * (c + d)) div (c * (a + b)) AS BIGINT)")
          .as("relative_risk_milli"),
        expr("CAST((1000000 * a) div (a + b)" +
          " - (1000000 * c) div (c + d) AS BIGINT)")
          .as("risk_diff_micro"))
  }

  /** Goodman-Kruskal λ (region | segment) and Theil's uncertainty
    * coefficient U(region | segment) on the customer contingency. */
  def q875: Q = Q(
    "q875_lambda_theil_u",
    Some("""
      |WITH ct AS (
      |  SELECT c.c_mktsegment AS seg, n.n_regionkey AS r,
      |         count(*) AS f
      |  FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
      |  GROUP BY 1, 2),
      |gl AS (SELECT sum(f) AS n FROM ct),
      |rm AS (SELECT r, sum(f) AS fr FROM ct GROUP BY 1),
      |mr AS (SELECT max(fr) AS fmax FROM rm),
      |sm AS (SELECT seg, max(f) AS fsmax FROM ct GROUP BY 1),
      |lam AS (SELECT sum(fsmax) AS sfs FROM sm),
      |hy AS (SELECT sum(CAST(-(CAST(fr AS DOUBLE) / gl.n)
      |              * ln(CAST(fr AS DOUBLE) / gl.n) AS DECIMAL(18,9)))
      |         AS h FROM rm CROSS JOIN gl),
      |hxy AS (SELECT sum(CAST(-(CAST(ct.f AS DOUBLE) / gl.n)
      |               * ln(CAST(ct.f AS DOUBLE) / ss.fs)
      |               AS DECIMAL(18,9))) AS h
      |        FROM ct CROSS JOIN gl
      |        JOIN (SELECT seg, sum(f) AS fs FROM ct GROUP BY 1) ss
      |          ON ss.seg = ct.seg)
      |SELECT CAST((1000 * (lam.sfs - mr.fmax))
      |            // (gl.n - mr.fmax) AS BIGINT) AS lambda_milli,
      |       CAST(floor(1000.0 * (CAST(hy.h AS DOUBLE)
      |            - CAST(hxy.h AS DOUBLE)) / CAST(hy.h AS DOUBLE))
      |            AS BIGINT) AS theil_u_milli
      |FROM lam CROSS JOIN mr CROSS JOIN gl CROSS JOIN hy CROSS JOIN hxy
      |""".stripMargin)) { (s, dir) =>
    val ct = Tables.customer(s, dir)
      .select(col("c_mktsegment").as("seg"), col("c_nationkey"))
      .join(broadcast(Tables.nation(s, dir)
        .select(col("n_nationkey"), col("n_regionkey").as("r"))),
        col("n_nationkey") === col("c_nationkey"))
      .groupBy(col("seg"), col("r")).agg(count(lit(1)).as("f"))
      .materialize()
    val gl = ct.agg(sum(col("f")).as("n"))
    val rm = ct.groupBy(col("r")).agg(sum(col("f")).as("fr")).materialize()
    val mr = rm.agg(max(col("fr")).as("fmax"))
    val lam = ct.groupBy(col("seg")).agg(max(col("f")).as("fsmax"))
      .agg(sum(col("fsmax")).as("sfs"))
    val hy = rm.crossJoin(broadcast(gl))
      .agg(sum(expr("""CAST(-(CAST(fr AS DOUBLE) / n)
        |  * ln(CAST(fr AS DOUBLE) / n) AS DECIMAL(18,9))"""
        .stripMargin)).as("hy"))
    val ss = ct.groupBy(col("seg")).agg(sum(col("f")).as("fs"))
    val hxy = ct.join(broadcast(ss), Seq("seg")).crossJoin(broadcast(gl))
      .agg(sum(expr("""CAST(-(CAST(f AS DOUBLE) / n)
        |  * ln(CAST(f AS DOUBLE) / fs) AS DECIMAL(18,9))"""
        .stripMargin)).as("hxy"))
    lam.crossJoin(broadcast(mr)).crossJoin(broadcast(gl))
      .crossJoin(broadcast(hy)).crossJoin(broadcast(hxy))
      .select(
        expr("CAST((1000 * (sfs - fmax)) div (n - fmax) AS BIGINT)")
          .as("lambda_milli"),
        expr("""CAST(floor(1000.0 * (CAST(hy AS DOUBLE)
          |  - CAST(hxy AS DOUBLE)) / CAST(hy AS DOUBLE)) AS BIGINT)"""
          .stripMargin).as("theil_u_milli"))
  }
}
