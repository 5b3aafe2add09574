package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables

/** Round-9 multiple-testing wave: Benjamini–Hochberg step-up,
  * Holm step-down, Fisher/Stouffer combination, Storey's π₀ with
  * q-values, and the Bonferroni-vs-Šidák single-step comparison —
  * run over ONE shared family of 25 per-nation return-rate z-tests
  * (nation vs rest, pooled two-proportion z from exact counts). The
  * normal tail is the Abramowitz–Stegun 7.1.26 erfc polynomial
  * written as IDENTICAL pinned-double text in both engines — the
  * family is a 25-row dim, so every procedure is exact-deterministic
  * window algebra on it. */
object MultiTestQueries {

  val all: Seq[Q] = Seq(q766, q767, q768, q769, q770)

  /** Two-sided p from z via A-S 7.1.26: p = erfc(|z|/√2), both
    * engines evaluate this exact text. */
  private def pOf(z: String): String = {
    val u = s"(abs($z) / sqrt(2.0))"
    val t = s"(1.0 / (1.0 + 0.3275911 * $u))"
    s"((0.254829592 * $t - 0.284496736 * $t * $t" +
      s" + 1.421413741 * $t * $t * $t" +
      s" - 1.453152027 * $t * $t * $t * $t" +
      s" + 1.061405429 * $t * $t * $t * $t * $t) * exp(-($u) * ($u)))"
  }

  /** Oracle CTEs: per-nation counts, the z statistic, p-value and the
    * ascending p rank — `pv(nk, z, p, i, m)`. */
  private def sqlPv: String = {
    val z = "((CAST(x AS DOUBLE) / n - CAST(xr AS DOUBLE) / nr)" +
      " / sqrt((CAST(x + xr AS DOUBLE) / (n + nr))" +
      " * (1.0 - CAST(x + xr AS DOUBLE) / (n + nr))" +
      " * (1.0 / CAST(n AS DOUBLE) + 1.0 / CAST(nr AS DOUBLE))))"
    s"""ln0 AS (
       |  SELECT s.s_nationkey AS nk,
       |         count(*) AS n,
       |         sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
       |           AS x
       |  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
       |  GROUP BY 1),
       |tot AS (SELECT sum(n) AS tn, sum(x) AS tx FROM ln0),
       |zz AS (
       |  SELECT nk, n, x, tot.tn - n AS nr, tot.tx - x AS xr
       |  FROM ln0 CROSS JOIN tot),
       |pv AS (
       |  SELECT nk, $z AS z, ${pOf(z)} AS p,
       |         row_number() OVER (ORDER BY ${pOf(z)}, nk) AS i,
       |         count(*) OVER () AS m
       |  FROM zz)""".stripMargin
  }

  /** Spark mirror of pv. */
  private def pv(s: SparkSession, dir: String): DataFrame = {
    val z = "((CAST(x AS DOUBLE) / n - CAST(xr AS DOUBLE) / nr)" +
      " / sqrt((CAST(x + xr AS DOUBLE) / (n + nr))" +
      " * (1.0 - CAST(x + xr AS DOUBLE) / (n + nr))" +
      " * (1.0 / CAST(n AS DOUBLE) + 1.0 / CAST(nr AS DOUBLE))))"
    val ln0 = Tables.lineitem(s, dir)
      .join(broadcast(Tables.supplier(s, dir)),
        col("s_suppkey") === col("l_suppkey"))
      .groupBy(col("s_nationkey").as("nk"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
          .as("x"))
      .materialize()
    val tot = ln0.agg(sum(col("n")).as("tn"), sum(col("x")).as("tx"))
    ln0.crossJoin(broadcast(tot))
      .select(col("nk"), col("n"), col("x"),
        (col("tn") - col("n")).as("nr"), (col("tx") - col("x")).as("xr"))
      .select(col("nk"), expr(z).as("z"), expr(pOf(z)).as("p"))
      .withColumn("i", row_number().over(Window.orderBy(col("p"),
        col("nk"))))
      .withColumn("m", count(lit(1)).over(Window.partitionBy(lit(1))))
  }

  /** Benjamini–Hochberg at q = 0.10: the step-up cut k = max{i :
    * p_(i) ≤ q·i/m} and the rejected nations — the FDR gate a
    * 25-way dashboard needs instead of per-cell α. */
  def q766: Q = Q(
    "q766_benjamini_hochberg",
    Some(s"""
      |WITH ${sqlPv},
      |ck AS (
      |  SELECT coalesce(max(CASE WHEN p <= CAST(0.10 AS DOUBLE) * i / m THEN i END), 0)
      |    AS k
      |  FROM pv)
      |SELECT CAST(pv.nk AS BIGINT) AS nationkey,
      |       CAST(pv.i AS BIGINT) AS p_rank,
      |       CAST(floor(pv.p * 1000000.0) AS BIGINT) AS p_micro,
      |       CAST(floor(pv.z * 1000.0) AS BIGINT) AS z_milli,
      |       CAST(CASE WHEN pv.i <= ck.k THEN 1 ELSE 0 END AS BIGINT)
      |         AS bh_rejected,
      |       CAST(ck.k AS BIGINT) AS bh_cut
      |FROM pv CROSS JOIN ck
      |ORDER BY p_rank
      |""".stripMargin)) { (s, dir) =>
    val p = pv(s, dir).materialize()
    val ck = p.agg(coalesce(max(when(
      col("p") <= lit(0.10) * col("i") / col("m"), col("i"))), lit(0L))
      .as("k"))
    p.crossJoin(broadcast(ck))
      .select(col("nk").cast("long").as("nationkey"),
        col("i").cast("long").as("p_rank"),
        expr("CAST(floor(p * 1000000.0) AS BIGINT)").as("p_micro"),
        expr("CAST(floor(z * 1000.0) AS BIGINT)").as("z_milli"),
        when(col("i") <= col("k"), 1L).otherwise(0L).as("bh_rejected"),
        col("k").cast("long").as("bh_cut"))
      .orderBy(col("p_rank"))
  }

  /** Holm step-down at α = 0.05: reject while p_(i) ≤ α/(m−i+1),
    * stop at the first failure — the FWER-exact sibling; reports the
    * count under Holm vs plain Bonferroni. */
  def q767: Q = Q(
    "q767_holm_stepdown",
    Some(s"""
      |WITH ${sqlPv},
      |fail AS (
      |  SELECT coalesce(min(CASE WHEN p > CAST(0.05 AS DOUBLE) / (m - i + 1) THEN i
      |    END), (SELECT max(m) FROM pv) + 1) AS f
      |  FROM pv)
      |SELECT CAST((SELECT max(m) FROM pv) AS BIGINT) AS n_tests,
      |       CAST(fail.f - 1 AS BIGINT) AS holm_rejections,
      |       (SELECT CAST(count(*) AS BIGINT) FROM pv
      |        WHERE p <= CAST(0.05 AS DOUBLE) / m) AS bonferroni_rejections
      |FROM fail
      |""".stripMargin)) { (s, dir) =>
    val p = pv(s, dir).materialize()
    val mm = p.agg(max(col("m")).as("mm"))
    val fail = p.crossJoin(broadcast(mm))
      .agg(coalesce(min(when(
        col("p") > lit(0.05) / (col("m") - col("i") + 1), col("i"))),
        (max(col("mm")) + 1)).as("f"))
    val bon = p.where(col("p") <= lit(0.05) / col("m"))
      .agg(count(lit(1)).as("b"))
    mm.crossJoin(broadcast(fail)).crossJoin(broadcast(bon))
      .select(col("mm").cast("long").as("n_tests"),
        (col("f") - 1).cast("long").as("holm_rejections"),
        col("b").as("bonferroni_rejections"))
  }

  /** Fisher's combined χ²_{2m} = −2Σln p and Stouffer's combined
    * Z = Σz/√m over the family — per-test terms micro-quantized
    * before the sums so the combination is exact-deterministic. */
  def q768: Q = Q(
    "q768_fisher_stouffer",
    Some(s"""
      |WITH ${sqlPv},
      |tm AS (
      |  SELECT max(m) AS m,
      |         sum(CAST(floor(-2.0 * ln(greatest(p, 1e-300)) * 1000000.0) AS BIGINT))
      |           AS chi6,
      |         sum(CAST(floor(z * 1000000.0) AS BIGINT)) AS z6
      |  FROM pv)
      |SELECT CAST(m AS BIGINT) AS n_tests,
      |       CAST(2 * m AS BIGINT) AS chi2_df,
      |       CAST(chi6 // 1000 AS BIGINT) AS fisher_chi2_milli,
      |       CAST(floor(CAST(z6 AS DOUBLE)
      |            / (sqrt(CAST(m AS DOUBLE)) * 1000000.0) * 1000.0)
      |            AS BIGINT) AS stouffer_z_milli
      |FROM tm
      |""".stripMargin)) { (s, dir) =>
    pv(s, dir)
      .agg(max(col("m")).as("m"),
        sum(expr("CAST(floor(-2.0 * ln(greatest(p, 1e-300)) * 1000000.0) AS BIGINT)"))
          .as("chi6"),
        sum(expr("CAST(floor(z * 1000000.0) AS BIGINT)")).as("z6"))
      .select(col("m").cast("long").as("n_tests"),
        expr("CAST(2 * m AS BIGINT)").as("chi2_df"),
        expr("CAST(chi6 div 1000 AS BIGINT)").as("fisher_chi2_milli"),
        expr("CAST(floor(CAST(z6 AS DOUBLE)" +
          " / (sqrt(CAST(m AS DOUBLE)) * 1000000.0) * 1000.0)" +
          " AS BIGINT)").as("stouffer_z_milli"))
  }

  /** Storey's π₀ at λ = 0.5 and the BH q-values (suffix-min of
    * m·p/i): the 10 smallest q-values with the null-share estimate —
    * how much of the family even looks non-null. */
  def q769: Q = Q(
    "q769_storey_qvalues",
    Some(s"""
      |WITH ${sqlPv},
      |pi0 AS (
      |  SELECT least(1.0,
      |           CAST(sum(CASE WHEN p > 0.5 THEN 1 ELSE 0 END)
      |             AS DOUBLE) / (0.5 * CAST(max(m) AS DOUBLE))) AS pi0
      |  FROM pv),
      |qv AS (
      |  SELECT nk, i, p,
      |         min(CAST(m AS DOUBLE) * p / i) OVER (ORDER BY i
      |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
      |           AS q
      |  FROM pv)
      |SELECT CAST(qv.nk AS BIGINT) AS nationkey,
      |       CAST(qv.i AS BIGINT) AS p_rank,
      |       CAST(floor(qv.p * 1000000.0) AS BIGINT) AS p_micro,
      |       CAST(floor(least(qv.q, 1.0) * 1000000.0) AS BIGINT)
      |         AS q_micro,
      |       CAST(floor(pi0.pi0 * 1000000.0) AS BIGINT) AS pi0_micro
      |FROM qv CROSS JOIN pi0
      |ORDER BY p_rank LIMIT 10
      |""".stripMargin)) { (s, dir) =>
    val p = pv(s, dir).materialize()
    val pi0 = p.agg(least(lit(1.0),
      sum(when(col("p") > 0.5, 1L).otherwise(0L)).cast("double")
        / (lit(0.5) * max(col("m")))).as("pi0"))
    val qv = p.withColumn("q",
      min(col("m").cast("double") * col("p") / col("i")).over(
        Window.orderBy(col("i")).rowsBetween(Window.currentRow,
          Window.unboundedFollowing)))
    qv.crossJoin(broadcast(pi0))
      .select(col("nk").cast("long").as("nationkey"),
        col("i").cast("long").as("p_rank"),
        expr("CAST(floor(p * 1000000.0) AS BIGINT)").as("p_micro"),
        expr("CAST(floor(least(q, 1.0) * 1000000.0) AS BIGINT)")
          .as("q_micro"),
        expr("CAST(floor(pi0 * 1000000.0) AS BIGINT)").as("pi0_micro"))
      .orderBy(col("p_rank"))
      .limit(10)
  }

  /** Bonferroni vs Šidák single-step at family α = 0.05: per-test
    * thresholds α/m vs 1−(1−α)^{1/m} and rejection counts — the
    * (tiny) power giveaway of Bonferroni, with the family minimum p. */
  def q770: Q = Q(
    "q770_bonferroni_sidak",
    Some(s"""
      |WITH ${sqlPv},
      |tm AS (
      |  SELECT max(m) AS m, min(p) AS pmin,
      |         sum(CASE WHEN p <= CAST(0.05 AS DOUBLE) / m THEN 1 ELSE 0 END) AS rb,
      |         sum(CASE WHEN p <= 1.0 - pow(0.95,
      |               1.0 / CAST(m AS DOUBLE)) THEN 1 ELSE 0 END) AS rs
      |  FROM pv)
      |SELECT CAST(m AS BIGINT) AS n_tests,
      |       CAST(floor(pmin * 1000000000.0) AS BIGINT) AS min_p_nano,
      |       CAST(floor(CAST(0.05 AS DOUBLE) / m * 1000000000.0) AS BIGINT)
      |         AS bonferroni_thresh_nano,
      |       CAST(floor((1.0 - pow(0.95, 1.0 / CAST(m AS DOUBLE)))
      |            * 1000000000.0) AS BIGINT) AS sidak_thresh_nano,
      |       CAST(rb AS BIGINT) AS bonferroni_rejections,
      |       CAST(rs AS BIGINT) AS sidak_rejections
      |FROM tm
      |""".stripMargin)) { (s, dir) =>
    pv(s, dir)
      .agg(max(col("m")).as("m"), min(col("p")).as("pmin"),
        sum(when(col("p") <= lit(0.05) / col("m"), 1L).otherwise(0L))
          .as("rb"),
        sum(when(col("p") <= lit(1.0)
          - pow(lit(0.95), lit(1.0) / col("m").cast("double")), 1L)
          .otherwise(0L)).as("rs"))
      .select(col("m").cast("long").as("n_tests"),
        expr("CAST(floor(pmin * 1000000000.0) AS BIGINT)")
          .as("min_p_nano"),
        expr("CAST(floor(CAST(0.05 AS DOUBLE) / m * 1000000000.0) AS BIGINT)")
          .as("bonferroni_thresh_nano"),
        expr("CAST(floor((1.0 - pow(0.95, 1.0 / CAST(m AS DOUBLE)))" +
          " * 1000000000.0) AS BIGINT)").as("sidak_thresh_nano"),
        col("rb").as("bonferroni_rejections"),
        col("rs").as("sidak_rejections"))
  }
}
