package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-9 process-capability wave on lineitem quantities against the
  * synthetic spec window [LSL=5, USL=45], target T=25: the Cp/Cpk
  * potential/actual pair, the Taguchi Cpm/Cpkm target-aware pair,
  * out-of-spec PPM by side, the Z-bench sigma-level margins, and the
  * expected Taguchi quadratic loss.
  *
  * Scale: quantities are small integers, so EVERY moment (n, Σx, Σx²,
  * side counts) is a one-pass exact integer aggregate; each index is
  * a single pinned double over those integers. The spec constants
  * are compile-time literals shared verbatim by both engines. */
object CapabilityQueries {

  val all: Seq[Q] = Seq(q856, q857, q858, q859, q860)

  // defs, not vals: `val all` above runs during object init and builds
  // the oracle SQL strings immediately — a val constant here would
  // still be 0 at that point and interpolate broken spec limits.
  private def LSL = 5
  private def USL = 45
  private def TGT = 25

  private def sqlMo: String = s"""
    |x AS (SELECT CAST(l_quantity AS BIGINT) AS v FROM lineitem),
    |mo AS (SELECT count(*) AS n, sum(CAST(v AS HUGEINT)) AS s,
    |              sum(CAST(v AS HUGEINT) * v) AS q,
    |              sum(CASE WHEN v < ${LSL} THEN 1 ELSE 0 END) AS nlo,
    |              sum(CASE WHEN v > ${USL} THEN 1 ELSE 0 END) AS nhi
    |       FROM x)""".stripMargin

  private def moBase(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_quantity").cast("long").as("v"))
      .select(col("v").cast("decimal(38,0)").as("vd"), col("v"))
      .agg(count(lit(1)).as("n"), sum(col("vd")).as("s"),
        sum(col("vd") * col("vd")).as("q"),
        sum(when(col("v") < LSL, 1).otherwise(0)).as("nlo"),
        sum(when(col("v") > USL, 1).otherwise(0)).as("nhi"))

  private def sdD: String =
    "sqrt(CAST(n * q - s * s AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1)))"
  private def muD: String = "(CAST(s AS DOUBLE) / n)"

  /** Cp (spec width over 6σ) and Cpk (nearest-margin over 3σ). */
  def q856: Q = Q(
    "q856_cp_cpk",
    Some(s"""
      |WITH ${sqlMo}
      |SELECT CAST(n AS BIGINT) AS n,
      |       CAST(floor(1000.0 * ${USL - LSL} / (6.0 * ${sdD}))
      |            AS BIGINT) AS cp_milli,
      |       CAST(floor(1000.0 * least(${USL} - ${muD},
      |            ${muD} - ${LSL}) / (3.0 * ${sdD})) AS BIGINT)
      |         AS cpk_milli
      |FROM mo
      |""".stripMargin)) { (s, dir) =>
    moBase(s, dir)
      .select(col("n").cast("long").as("n"),
        expr(s"CAST(floor(1000.0 * ${USL - LSL} / (6.0 * ${sdD}))" +
          " AS BIGINT)").as("cp_milli"),
        expr(s"CAST(floor(1000.0 * least(${USL} - ${muD}," +
          s" ${muD} - ${LSL}) / (3.0 * ${sdD})) AS BIGINT)")
          .as("cpk_milli"))
  }

  /** Taguchi Cpm and Cpkm: the target-deviation-inflated variants
    * using τ² = σ² + (μ − T)². */
  def q857: Q = Q(
    "q857_taguchi_cpm",
    Some(s"""
      |WITH ${sqlMo}
      |SELECT CAST(floor(1000.0 * ${USL - LSL} / (6.0
      |         * sqrt(CAST(n * q - s * s AS DOUBLE)
      |                / (CAST(n AS DOUBLE) * (n - 1))
      |                + (${muD} - ${TGT}) * (${muD} - ${TGT}))))
      |            AS BIGINT) AS cpm_milli,
      |       CAST(floor(1000.0 * least(${USL} - ${muD},
      |         ${muD} - ${LSL}) / (3.0
      |         * sqrt(CAST(n * q - s * s AS DOUBLE)
      |                / (CAST(n AS DOUBLE) * (n - 1))
      |                + (${muD} - ${TGT}) * (${muD} - ${TGT}))))
      |            AS BIGINT) AS cpkm_milli
      |FROM mo
      |""".stripMargin)) { (s, dir) =>
    val tau = s"sqrt(CAST(n * q - s * s AS DOUBLE)" +
      s" / (CAST(n AS DOUBLE) * (n - 1))" +
      s" + (${muD} - ${TGT}) * (${muD} - ${TGT}))"
    moBase(s, dir)
      .select(
        expr(s"CAST(floor(1000.0 * ${USL - LSL} / (6.0 * ${tau}))" +
          " AS BIGINT)").as("cpm_milli"),
        expr(s"CAST(floor(1000.0 * least(${USL} - ${muD}," +
          s" ${muD} - ${LSL}) / (3.0 * ${tau})) AS BIGINT)")
          .as("cpkm_milli"))
  }

  /** Observed out-of-spec PPM by side — exact integer ratios. */
  def q858: Q = Q(
    "q858_oos_ppm",
    Some(s"""
      |WITH ${sqlMo}
      |SELECT CAST(nlo AS BIGINT) AS n_below,
      |       CAST(nhi AS BIGINT) AS n_above,
      |       CAST((1000000 * nlo) // n AS BIGINT) AS ppm_below,
      |       CAST((1000000 * nhi) // n AS BIGINT) AS ppm_above,
      |       CAST((1000000 * (nlo + nhi)) // n AS BIGINT) AS ppm_total
      |FROM mo
      |""".stripMargin)) { (s, dir) =>
    moBase(s, dir)
      .select(col("nlo").cast("long").as("n_below"),
        col("nhi").cast("long").as("n_above"),
        expr("CAST((1000000 * nlo) div n AS BIGINT)").as("ppm_below"),
        expr("CAST((1000000 * nhi) div n AS BIGINT)").as("ppm_above"),
        expr("CAST((1000000 * (nlo + nhi)) div n AS BIGINT)")
          .as("ppm_total"))
  }

  /** Z-bench margins: standardized distances from the mean to each
    * spec limit, and the binding (minimum) sigma level. */
  def q859: Q = Q(
    "q859_sigma_level",
    Some(s"""
      |WITH ${sqlMo}
      |SELECT CAST(floor(1000.0 * (${USL} - ${muD}) / ${sdD}) AS BIGINT)
      |         AS z_upper_milli,
      |       CAST(floor(1000.0 * (${muD} - ${LSL}) / ${sdD}) AS BIGINT)
      |         AS z_lower_milli,
      |       CAST(floor(1000.0 * least(${USL} - ${muD}, ${muD} - ${LSL})
      |            / ${sdD}) AS BIGINT) AS z_bench_milli
      |FROM mo
      |""".stripMargin)) { (s, dir) =>
    moBase(s, dir)
      .select(
        expr(s"CAST(floor(1000.0 * (${USL} - ${muD}) / ${sdD})" +
          " AS BIGINT)").as("z_upper_milli"),
        expr(s"CAST(floor(1000.0 * (${muD} - ${LSL}) / ${sdD})" +
          " AS BIGINT)").as("z_lower_milli"),
        expr(s"CAST(floor(1000.0 * least(${USL} - ${muD}," +
          s" ${muD} - ${LSL}) / ${sdD}) AS BIGINT)")
          .as("z_bench_milli"))
  }

  /** Expected Taguchi quadratic loss per unit, k = 1/half-width²:
    * L = (σ²_pop + (μ−T)²)/((USL−T)²) — exact integer numerator. */
  def q860: Q = Q(
    "q860_taguchi_loss",
    Some(s"""
      |WITH ${sqlMo}
      |SELECT CAST(n AS BIGINT) AS n,
      |       CAST(floor(1000000.0
      |         * (CAST(n * q - s * s AS DOUBLE)
      |            / (CAST(n AS DOUBLE) * n)
      |            + (${muD} - ${TGT}) * (${muD} - ${TGT}))
      |         / ${(USL - TGT) * (USL - TGT)}) AS BIGINT)
      |         AS taguchi_loss_micro
      |FROM mo
      |""".stripMargin)) { (s, dir) =>
    moBase(s, dir)
      .select(col("n").cast("long").as("n"),
        expr(s"""CAST(floor(1000000.0
          |  * (CAST(n * q - s * s AS DOUBLE)
          |     / (CAST(n AS DOUBLE) * n)
          |     + (${muD} - ${TGT}) * (${muD} - ${TGT}))
          |  / ${(USL - TGT) * (USL - TGT)}) AS BIGINT)""".stripMargin)
          .as("taguchi_loss_micro"))
  }
}
