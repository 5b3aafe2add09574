package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables
import graft.text.TextAnalysis

/** Round-9 ecology-of-corpora wave: the abundance-based coverage
  * estimator (ACE), Chao2 incidence richness across sources,
  * Bray–Curtis and Morisita–Horn between-language dissimilarity, and
  * Pielou evenness — the vocabulary-richness battery beyond the
  * shipped Chao1 (q541) / Hill numbers (q564) / Good–Turing (q466)
  * faces. All ride the house whitespace-token spine; per-type
  * irrational terms (n·ln n) are quantized per TYPE before any sum,
  * pair overlaps join vocab-dim count frames (never document pairs). */
object DiversityQueries {

  val all: Seq[Q] = Seq(q726, q727, q728, q729, q730)

  /** Oracle CTE `tok(lang, source, w)` — one row per token. */
  private def sqlTok: String = """
    |tok AS (
    |  SELECT lang, source,
    |         unnest(regexp_split_to_array(trim(text), '\s+')) AS w
    |  FROM documents)""".stripMargin

  private def tok(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("lang"), col("source"),
        explode(TextAnalysis.tokens(col("text"))).as("w"))

  /** ACE richness: rare types (count ≤ 10) estimated through sample
    * coverage C = 1 − f1/N_rare and the CV correction γ². All moments
    * (f_k, Σk(k−1)f_k) are exact integers from the frequency-of-
    * frequencies dim; the final estimator is one pinned-double
    * formula. */
  def q726: Q = Q(
    "q726_ace_richness",
    Some(s"""
      |WITH ${sqlTok},
      |tc AS (SELECT w, count(*) AS c FROM tok GROUP BY 1),
      |ff AS (
      |  SELECT count(*) AS s_obs,
      |         sum(CASE WHEN c <= 10 THEN 1 ELSE 0 END) AS s_rare,
      |         sum(CASE WHEN c > 10 THEN 1 ELSE 0 END) AS s_abund,
      |         sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS f1,
      |         sum(CASE WHEN c <= 10 THEN c ELSE 0 END) AS n_rare,
      |         sum(CASE WHEN c <= 10
      |             THEN CAST(c AS HUGEINT) * (c - 1) ELSE 0 END) AS kk
      |  FROM tc)
      |SELECT CAST(s_obs AS BIGINT) AS s_observed,
      |       CAST(s_rare AS BIGINT) AS s_rare,
      |       CAST(f1 AS BIGINT) AS singletons,
      |       CAST(CASE WHEN n_rare = 0 THEN NULL
      |            ELSE floor((1.0 - CAST(f1 AS DOUBLE) / n_rare)
      |                 * 1000000.0) END AS BIGINT) AS coverage_ppm,
      |       CAST(CASE WHEN n_rare = 0 THEN s_abund
      |            WHEN f1 = n_rare OR n_rare = 1 THEN NULL
      |            ELSE floor(CAST(s_abund AS DOUBLE)
      |         + CAST(s_rare AS DOUBLE)
      |           / (1.0 - CAST(f1 AS DOUBLE) / n_rare)
      |         + CAST(f1 AS DOUBLE)
      |           / (1.0 - CAST(f1 AS DOUBLE) / n_rare)
      |           * greatest(CAST(s_rare AS DOUBLE)
      |               / (1.0 - CAST(f1 AS DOUBLE) / n_rare)
      |               * CAST(kk AS DOUBLE)
      |               / (CAST(n_rare AS DOUBLE) * (n_rare - 1)) - 1.0,
      |             0.0)) END AS BIGINT) AS ace_estimate
      |FROM ff
      |""".stripMargin)) { (s, dir) =>
    tok(s, dir)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("s_obs"),
        sum(when(col("c") <= 10, 1L).otherwise(0L)).as("s_rare"),
        sum(when(col("c") > 10, 1L).otherwise(0L)).as("s_abund"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("c") <= 10, col("c")).otherwise(0L)).as("n_rare"),
        sum(when(col("c") <= 10,
          col("c").cast("decimal(38,0)") * (col("c") - 1))
          .otherwise(lit(0))).as("kk"))
      .select(col("s_obs").as("s_observed"), col("s_rare"),
        col("f1").as("singletons"),
        expr("CAST(CASE WHEN n_rare = 0 THEN NULL" +
          " ELSE floor((1.0 - CAST(f1 AS DOUBLE) / n_rare)" +
          " * 1000000.0) END AS BIGINT)").as("coverage_ppm"),
        expr("CAST(CASE WHEN n_rare = 0 THEN s_abund" +
          " WHEN f1 = n_rare OR n_rare = 1 THEN NULL" +
          " ELSE floor(CAST(s_abund AS DOUBLE)" +
          " + CAST(s_rare AS DOUBLE)" +
          " / (1.0 - CAST(f1 AS DOUBLE) / n_rare)" +
          " + CAST(f1 AS DOUBLE)" +
          " / (1.0 - CAST(f1 AS DOUBLE) / n_rare)" +
          " * greatest(CAST(s_rare AS DOUBLE)" +
          " / (1.0 - CAST(f1 AS DOUBLE) / n_rare)" +
          " * CAST(kk AS DOUBLE)" +
          " / (CAST(n_rare AS DOUBLE) * (n_rare - 1)) - 1.0," +
          " 0.0)) END AS BIGINT)").as("ace_estimate"))
  }

  /** Chao2 incidence-based richness: how many token types exist
    * beyond what the 20 SOURCES jointly show, from presence/absence
    * incidences (Q1 = types in exactly one source, Q2 = two) —
    * fully integer with the (m−1)/m small-sample factor. */
  def q727: Q = Q(
    "q727_chao2_sources",
    Some(s"""
      |WITH ${sqlTok},
      |inc AS (
      |  SELECT w, count(DISTINCT source) AS k FROM tok GROUP BY 1),
      |m AS (SELECT count(DISTINCT source) AS m FROM tok),
      |qq AS (
      |  SELECT count(*) AS s_obs,
      |         sum(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS q1,
      |         sum(CASE WHEN k = 2 THEN 1 ELSE 0 END) AS q2
      |  FROM inc)
      |SELECT CAST(s_obs AS BIGINT) AS s_observed,
      |       CAST(q1 AS BIGINT) AS uniques,
      |       CAST(q2 AS BIGINT) AS duplicates,
      |       CAST(s_obs + ((m - 1) * CAST(q1 AS HUGEINT) * (q1 - 1))
      |            // (m * 2 * (q2 + 1)) AS BIGINT) AS chao2_estimate
      |FROM qq CROSS JOIN m
      |""".stripMargin)) { (s, dir) =>
    val inc = tok(s, dir)
      .groupBy(col("w")).agg(countDistinct(col("source")).as("k"))
    val m = tok(s, dir)
      .agg(countDistinct(col("source")).as("m"))
    inc.agg(count(lit(1)).as("s_obs"),
        sum(when(col("k") === 1, 1L).otherwise(0L)).as("q1"),
        sum(when(col("k") === 2, 1L).otherwise(0L)).as("q2"))
      .crossJoin(broadcast(m))
      .select(col("s_obs").as("s_observed"), col("q1").as("uniques"),
        col("q2").as("duplicates"),
        expr("CAST(s_obs + ((m - 1) * CAST(q1 AS DECIMAL(38,0))" +
          " * (q1 - 1)) div (m * 2 * (q2 + 1)) AS BIGINT)")
          .as("chao2_estimate"))
  }

  /** Bray–Curtis dissimilarity between language token-count profiles:
    * BC = 1 − 2Σmin(x,y)/(N_a+N_b) for each lang pair — an inner join
    * of two vocab-dim count frames per pair (shared types only; the
    * min of disjoint types is 0), exact integers. */
  def q728: Q = Q(
    "q728_bray_curtis_langs",
    Some(s"""
      |WITH ${sqlTok},
      |lc AS (SELECT lang, w, count(*) AS c FROM tok GROUP BY 1, 2),
      |lt AS (SELECT lang, sum(c) AS n FROM lc GROUP BY 1),
      |pw AS (
      |  SELECT a.lang AS la, b.lang AS lb,
      |         sum(least(a.c, b.c)) AS smin
      |  FROM lc a JOIN lc b ON a.w = b.w AND a.lang < b.lang
      |  GROUP BY 1, 2)
      |SELECT pw.la AS lang_a, pw.lb AS lang_b,
      |       CAST(pw.smin AS BIGINT) AS shared_mass,
      |       CAST(1000000 - (2000000 * pw.smin) // (ta.n + tb.n)
      |            AS BIGINT) AS bray_curtis_ppm
      |FROM pw JOIN lt ta ON ta.lang = pw.la
      |        JOIN lt tb ON tb.lang = pw.lb
      |ORDER BY lang_a, lang_b
      |""".stripMargin)) { (s, dir) =>
    val lc = tok(s, dir)
      .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("c"))
      .materialize() // lang×vocab dim, feeds totals + the pair join
    val lt = lc.groupBy(col("lang")).agg(sum(col("c")).as("n"))
    val a = lc.select(col("lang").as("la"), col("w"), col("c").as("ca"))
    val b = lc.select(col("lang").as("lb"), col("w"), col("c").as("cb"))
    a.join(b, a("w") === b("w") && col("la") < col("lb"))
      .groupBy(col("la"), col("lb"))
      .agg(sum(least(col("ca"), col("cb"))).as("smin"))
      .join(broadcast(lt.select(col("lang").as("la"),
        col("n").as("na"))), Seq("la"))
      .join(broadcast(lt.select(col("lang").as("lb"),
        col("n").as("nb"))), Seq("lb"))
      .select(col("la").as("lang_a"), col("lb").as("lang_b"),
        col("smin").as("shared_mass"),
        expr("CAST(1000000 - (2000000 * smin) div (na + nb) AS BIGINT)")
          .as("bray_curtis_ppm"))
      .orderBy(col("lang_a"), col("lang_b"))
  }

  /** Morisita–Horn overlap between language profiles — the abundance
    * overlap index robust to sample size: MH = 2XYΣxy/(Y²Σx²+X²Σy²),
    * exact rational on integer count moments (ppm). */
  def q729: Q = Q(
    "q729_morisita_horn_langs",
    Some(s"""
      |WITH ${sqlTok},
      |lc AS (SELECT lang, w, count(*) AS c FROM tok GROUP BY 1, 2),
      |lt AS (SELECT lang, sum(c) AS n,
      |              sum(CAST(c AS HUGEINT) * c) AS s2 FROM lc GROUP BY 1),
      |pw AS (
      |  SELECT a.lang AS la, b.lang AS lb,
      |         sum(CAST(a.c AS HUGEINT) * b.c) AS sxy
      |  FROM lc a JOIN lc b ON a.w = b.w AND a.lang < b.lang
      |  GROUP BY 1, 2)
      |SELECT pw.la AS lang_a, pw.lb AS lang_b,
      |       CAST((2000000 * pw.sxy * ta.n * tb.n)
      |            // (CAST(tb.n AS HUGEINT) * tb.n * ta.s2
      |                + CAST(ta.n AS HUGEINT) * ta.n * tb.s2)
      |            AS BIGINT) AS morisita_horn_ppm
      |FROM pw JOIN lt ta ON ta.lang = pw.la
      |        JOIN lt tb ON tb.lang = pw.lb
      |ORDER BY lang_a, lang_b
      |""".stripMargin)) { (s, dir) =>
    val lc = tok(s, dir)
      .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("c"))
      .materialize()
    val lt = lc.groupBy(col("lang"))
      .agg(sum(col("c")).as("n"),
        sum(col("c").cast("decimal(38,0)") * col("c")).as("s2"))
    val a = lc.select(col("lang").as("la"), col("w"), col("c").as("ca"))
    val b = lc.select(col("lang").as("lb"), col("w"), col("c").as("cb"))
    a.join(b, a("w") === b("w") && col("la") < col("lb"))
      .groupBy(col("la"), col("lb"))
      .agg(sum(col("ca").cast("decimal(38,0)") * col("cb")).as("sxy"))
      .join(broadcast(lt.select(col("lang").as("la"), col("n").as("na"),
        col("s2").as("sa2"))), Seq("la"))
      .join(broadcast(lt.select(col("lang").as("lb"), col("n").as("nb"),
        col("s2").as("sb2"))), Seq("lb"))
      .select(col("la").as("lang_a"), col("lb").as("lang_b"),
        expr("CAST((2000000 * sxy * na * nb)" +
          " div (CAST(nb AS DECIMAL(38,0)) * nb * sa2" +
          " + CAST(na AS DECIMAL(38,0)) * na * sb2) AS BIGINT)")
          .as("morisita_horn_ppm"))
      .orderBy(col("lang_a"), col("lang_b"))
  }

  /** Pielou evenness per language: J = H/ln S with H = ln N −
    * (Σn·ln n)/N. Each type's n·ln n is micro-quantized BEFORE the
    * sum (exact integer Σ), so the one remaining double formula is
    * pinned. */
  def q730: Q = Q(
    "q730_pielou_evenness",
    Some(s"""
      |WITH ${sqlTok},
      |lc AS (SELECT lang, w, count(*) AS c FROM tok GROUP BY 1, 2),
      |tm AS (
      |  SELECT lang, count(*) AS s_types, sum(c) AS n,
      |         sum(CAST(floor(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))
      |             * 1000000) AS HUGEINT)) AS snln
      |  FROM lc GROUP BY 1)
      |SELECT lang, CAST(n AS BIGINT) AS n_tokens,
      |       CAST(s_types AS BIGINT) AS s_types,
      |       CAST(floor((ln(CAST(n AS DOUBLE)) - CAST(snln AS DOUBLE)
      |            / (CAST(n AS DOUBLE) * 1000000.0)) * 1000.0)
      |            AS BIGINT) AS shannon_h_milli,
      |       CAST(floor((ln(CAST(n AS DOUBLE)) - CAST(snln AS DOUBLE)
      |            / (CAST(n AS DOUBLE) * 1000000.0))
      |            / ln(CAST(s_types AS DOUBLE)) * 1000000.0)
      |            AS BIGINT) AS pielou_j_micro
      |FROM tm ORDER BY lang
      |""".stripMargin)) { (s, dir) =>
    tok(s, dir)
      .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("s_types"), sum(col("c")).as("n"),
        sum(floor(col("c").cast("double")
          * log(col("c").cast("double")) * 1000000)
          .cast("decimal(38,0)")).as("snln"))
      .select(col("lang"), col("n").as("n_tokens"), col("s_types"),
        expr("CAST(floor((ln(CAST(n AS DOUBLE)) - CAST(snln AS DOUBLE)" +
          " / (CAST(n AS DOUBLE) * 1000000.0)) * 1000.0) AS BIGINT)")
          .as("shannon_h_milli"),
        expr("CAST(floor((ln(CAST(n AS DOUBLE)) - CAST(snln AS DOUBLE)" +
          " / (CAST(n AS DOUBLE) * 1000000.0))" +
          " / ln(CAST(s_types AS DOUBLE)) * 1000000.0) AS BIGINT)")
          .as("pielou_j_micro"))
      .orderBy(col("lang"))
  }
}
