package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.text.TextAnalysis

/** Round-9 stylometry-constants wave: Honoré's R, Sichel's S,
  * Brunet's W, Herdan's C and the hapax/dis-legomena source profile —
  * the classical vocabulary-richness constants next to the shipped
  * Yule's K (q605), MATTR (q546) and lexical-richness (q208) faces.
  * Every statistic is a closed form over (N tokens, V types, V1
  * hapaxes, V2 dis legomena) per group — exact integers into one
  * pinned-double formula, no per-type terms at all. */
object StylometryQueries {

  val all: Seq[Q] = Seq(q761, q762, q763, q764, q765)

  /** Oracle CTE `st(lang, n, v, v1, v2)`. */
  private def sqlSt: String = """
    |tok AS (
    |  SELECT lang,
    |         unnest(regexp_split_to_array(trim(text), '\s+')) AS w
    |  FROM documents),
    |tc AS (SELECT lang, w, count(*) AS c FROM tok GROUP BY 1, 2),
    |st AS (
    |  SELECT lang, sum(c) AS n, count(*) AS v,
    |         sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS v1,
    |         sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS v2
    |  FROM tc GROUP BY 1)""".stripMargin

  private def st(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("lang"), explode(TextAnalysis.tokens(col("text")))
        .as("w"))
      .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("lang"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("v"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("v1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("v2"))

  /** Honoré's R = 100·ln N / (1 − V1/V) per language (∞ when every
    * type is a hapax — guarded NULL in shared text). */
  def q761: Q = Q(
    "q761_honore_r",
    Some(s"""
      |WITH ${sqlSt}
      |SELECT lang, CAST(n AS BIGINT) AS n_tokens,
      |       CAST(v1 AS BIGINT) AS hapaxes,
      |       CAST(CASE WHEN v1 = v THEN NULL
      |            ELSE floor(100.0 * ln(CAST(n AS DOUBLE))
      |                 / (1.0 - CAST(v1 AS DOUBLE) / v) * 1000.0)
      |            END AS BIGINT) AS honore_r_milli
      |FROM st ORDER BY lang
      |""".stripMargin)) { (s, dir) =>
    st(s, dir)
      .select(col("lang"), col("n").as("n_tokens"),
        col("v1").as("hapaxes"),
        expr("CAST(CASE WHEN v1 = v THEN NULL" +
          " ELSE floor(100.0 * ln(CAST(n AS DOUBLE))" +
          " / (1.0 - CAST(v1 AS DOUBLE) / v) * 1000.0)" +
          " END AS BIGINT)").as("honore_r_milli"))
      .orderBy(col("lang"))
  }

  /** Sichel's S = V2/V (exact ppm) — stable across text lengths,
    * the dis-legomena share. */
  def q762: Q = Q(
    "q762_sichel_s",
    Some(s"""
      |WITH ${sqlSt}
      |SELECT lang, CAST(v AS BIGINT) AS v_types,
      |       CAST(v2 AS BIGINT) AS dis_legomena,
      |       CAST((1000000 * v2) // v AS BIGINT) AS sichel_s_ppm
      |FROM st ORDER BY lang
      |""".stripMargin)) { (s, dir) =>
    st(s, dir)
      .select(col("lang"), col("v").as("v_types"),
        col("v2").as("dis_legomena"),
        expr("CAST((1000000 * v2) div v AS BIGINT)")
          .as("sichel_s_ppm"))
      .orderBy(col("lang"))
  }

  /** Brunet's W = N^(V^−0.165) per language (milli) — lower = richer
    * vocabulary, nearly length-invariant. */
  def q763: Q = Q(
    "q763_brunet_w",
    Some(s"""
      |WITH ${sqlSt}
      |SELECT lang, CAST(n AS BIGINT) AS n_tokens,
      |       CAST(v AS BIGINT) AS v_types,
      |       CAST(floor(pow(CAST(n AS DOUBLE),
      |            pow(CAST(v AS DOUBLE), -0.165)) * 1000.0) AS BIGINT)
      |         AS brunet_w_milli
      |FROM st ORDER BY lang
      |""".stripMargin)) { (s, dir) =>
    st(s, dir)
      .select(col("lang"), col("n").as("n_tokens"),
        col("v").as("v_types"),
        expr("CAST(floor(pow(CAST(n AS DOUBLE)," +
          " pow(CAST(v AS DOUBLE), -0.165)) * 1000.0) AS BIGINT)")
          .as("brunet_w_milli"))
      .orderBy(col("lang"))
  }

  /** Herdan's C = ln V / ln N (micro) — the log-log type-token
    * slope; constant under Heaps' law growth. */
  def q764: Q = Q(
    "q764_herdan_c",
    Some(s"""
      |WITH ${sqlSt}
      |SELECT lang,
      |       CAST(floor(ln(CAST(v AS DOUBLE))
      |            / ln(CAST(n AS DOUBLE)) * 1000000.0) AS BIGINT)
      |         AS herdan_c_micro
      |FROM st ORDER BY lang
      |""".stripMargin)) { (s, dir) =>
    st(s, dir)
      .select(col("lang"),
        expr("CAST(floor(ln(CAST(v AS DOUBLE))" +
          " / ln(CAST(n AS DOUBLE)) * 1000000.0) AS BIGINT)")
          .as("herdan_c_micro"))
      .orderBy(col("lang"))
  }

  /** Hapax/dis-legomena profile per SOURCE: the V1/V and V2/V1
    * ratios every crawl-quality triage reads (a source whose hapax
    * share explodes is noise or boilerplate-stripped wrong). */
  def q765: Q = Q(
    "q765_hapax_profile_sources",
    Some("""
      |WITH tok AS (
      |  SELECT source,
      |         unnest(regexp_split_to_array(trim(text), '\s+')) AS w
      |  FROM documents),
      |tc AS (SELECT source, w, count(*) AS c FROM tok GROUP BY 1, 2),
      |st AS (
      |  SELECT source, sum(c) AS n, count(*) AS v,
      |         sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS v1,
      |         sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS v2
      |  FROM tc GROUP BY 1)
      |SELECT source, CAST(n AS BIGINT) AS n_tokens,
      |       CAST(v AS BIGINT) AS v_types,
      |       CAST((1000000 * v1) // v AS BIGINT) AS hapax_share_ppm,
      |       CAST(CASE WHEN v1 = 0 THEN NULL
      |            ELSE (1000000 * v2) // v1 END AS BIGINT)
      |         AS dis_to_hapax_ppm
      |FROM st ORDER BY source
      |""".stripMargin)) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("source"), explode(TextAnalysis.tokens(col("text")))
        .as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("v"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("v1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("v2"))
      .select(col("source"), col("n").as("n_tokens"),
        col("v").as("v_types"),
        expr("CAST((1000000 * v1) div v AS BIGINT)")
          .as("hapax_share_ppm"),
        expr("CAST(CASE WHEN v1 = 0 THEN NULL" +
          " ELSE (1000000 * v2) div v1 END AS BIGINT)")
          .as("dis_to_hapax_ppm"))
      .orderBy(col("source"))
  }
}
