package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-11 readability-panel wave: the five classic grade-level
  * formulas a corpus-curation pipeline runs beside Flesch (q408) —
  * Automated Readability Index, Coleman–Liau, LIX/RIX, Gunning fog,
  * and SMOG — per source over `documents`.
  *
  * Definitions (stated identically in both engines): words =
  * whitespace tokens of the trimmed text; sentences = terminal
  * punctuation runs `[.!?]+` (min 1); letters = alphanumeric
  * characters (length minus `[A-Za-z0-9]`-stripped length — the
  * corpus is ASCII, so both engines count identically); long words =
  * tokens with > 6 characters (the LIX convention); complex words =
  * tokens with ≥ 3 vowel groups (the q408 syllable proxy).
  *
  * Exactness: every per-doc grade is one shared-text double formula
  * over exact integer counts, quantized through DECIMAL(28,6) and
  * floored to milli BEFORE the order-free integer mean (the q408
  * discipline); pooled ratios are integer `div`/`//`.
  *
  * Scale: each query is ONE scan of `documents` projecting only
  * (source, text) — no joins, no windows over the fact, group-by on
  * the bounded source dim. Regex work is embarrassingly parallel;
  * at 100 TB this is a map-side-combine aggregate per source. */
object ReadabilityQueries {

  val all: Seq[Q] = Seq(q1091, q1092, q1093, q1094, q1095)

  /** Shared doc-milli quantizer over a double formula text. */
  private def milli(f: String): String =
    s"CAST(floor(CAST($f AS DECIMAL(28,6)) * 1000) AS BIGINT)"

  /** Oracle per-doc measures CTE m(source, w, sents, letters, lw, cw). */
  private def sqlM: String = s"""
    |m AS (
    |  SELECT source,
    |         CAST(len(${PipelineQueries.sqlTokens("text")}) AS BIGINT)
    |           AS w,
    |         greatest(CAST(len(regexp_extract_all(text, '[.!?]+'))
    |           AS BIGINT), 1) AS sents,
    |         CAST(length(text)
    |           - length(regexp_replace(text, '[A-Za-z0-9]', '', 'g'))
    |           AS BIGINT) AS letters,
    |         CAST(len(list_filter(${PipelineQueries.sqlTokens("text")},
    |           t -> len(t) > 6)) AS BIGINT) AS lw,
    |         CAST(len(list_filter(${PipelineQueries.sqlTokens("text")},
    |           t -> len(regexp_extract_all(lower(t), '[aeiou]+')) >= 3))
    |           AS BIGINT) AS cw
    |  FROM documents WHERE trim(text) <> '')""".stripMargin

  /** Spark twin of [[sqlM]]. */
  private def m(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .where(trim(col("text")) =!= "")
      .select(col("source"),
        expr("CAST(size(split(trim(text), '\\\\s+')) AS BIGINT)")
          .as("w"),
        greatest(expr("CAST(size(regexp_extract_all(text, '[.!?]+', 0))" +
          " AS BIGINT)"), lit(1L)).as("sents"),
        expr("CAST(length(text)" +
          " - length(regexp_replace(text, '[A-Za-z0-9]', ''))" +
          " AS BIGINT)").as("letters"),
        expr("CAST(size(filter(split(trim(text), '\\\\s+')," +
          " t -> length(t) > 6)) AS BIGINT)").as("lw"),
        expr("CAST(size(filter(split(trim(text), '\\\\s+')," +
          " t -> size(regexp_extract_all(lower(t), '[aeiou]+', 0)) >= 3))" +
          " AS BIGINT)").as("cw"))

  /** Automated Readability Index per source: 4.71·chars/word +
    * 0.5·words/sentence − 21.43, doc-milli then exact mean. */
  def q1091: Q = {
    val ari = "(4.71 * (CAST(letters AS DOUBLE) / CAST(w AS DOUBLE))" +
      " + 0.5 * (CAST(w AS DOUBLE) / CAST(sents AS DOUBLE)) - 21.43)"
    Q("q1091_ari_readability",
      Some(s"""
        |WITH ${sqlM},
        |d AS (SELECT source, w, sents, letters, ${milli(ari)} AS gm
        |      FROM m)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(gm) // count(*) AS BIGINT) AS mean_ari_milli,
        |       CAST((1000 * sum(letters)) // sum(w) AS BIGINT)
        |         AS chars_per_word_milli,
        |       CAST((1000 * sum(w)) // sum(sents) AS BIGINT)
        |         AS words_per_sent_milli
        |FROM d GROUP BY source ORDER BY source
        |""".stripMargin)) { (s, dir) =>
      m(s, dir)
        .select(col("source"), col("w"), col("sents"), col("letters"),
          expr(milli(ari)).as("gm"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("gm")).as("sg"),
          sum(col("letters")).as("sl"), sum(col("w")).as("sw"),
          sum(col("sents")).as("ss"))
        .select(col("source"), col("n_docs"),
          expr("CAST(sg div n_docs AS BIGINT)").as("mean_ari_milli"),
          expr("CAST((1000 * sl) div sw AS BIGINT)")
            .as("chars_per_word_milli"),
          expr("CAST((1000 * sw) div ss AS BIGINT)")
            .as("words_per_sent_milli"))
        .orderBy(col("source"))
    }
  }

  /** Coleman–Liau index per source: 0.0588·L − 0.296·S − 15.8 with
    * L = letters per 100 words, S = sentences per 100 words. */
  def q1092: Q = {
    val cli = "(0.0588 * (100.0 * CAST(letters AS DOUBLE)" +
      " / CAST(w AS DOUBLE))" +
      " - 0.296 * (100.0 * CAST(sents AS DOUBLE) / CAST(w AS DOUBLE))" +
      " - 15.8)"
    Q("q1092_coleman_liau",
      Some(s"""
        |WITH ${sqlM},
        |d AS (SELECT source, w, sents, letters, ${milli(cli)} AS gm
        |      FROM m)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(gm) // count(*) AS BIGINT) AS mean_cli_milli,
        |       CAST((100000 * sum(letters)) // sum(w) AS BIGINT)
        |         AS l_per_100w_milli,
        |       CAST((100000 * sum(sents)) // sum(w) AS BIGINT)
        |         AS s_per_100w_milli
        |FROM d GROUP BY source ORDER BY source
        |""".stripMargin)) { (s, dir) =>
      m(s, dir)
        .select(col("source"), col("w"), col("sents"), col("letters"),
          expr(milli(cli)).as("gm"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("gm")).as("sg"),
          sum(col("letters")).as("sl"), sum(col("sents")).as("ss"),
          sum(col("w")).as("sw"))
        .select(col("source"), col("n_docs"),
          expr("CAST(sg div n_docs AS BIGINT)").as("mean_cli_milli"),
          expr("CAST((100000 * sl) div sw AS BIGINT)")
            .as("l_per_100w_milli"),
          expr("CAST((100000 * ss) div sw AS BIGINT)")
            .as("s_per_100w_milli"))
        .orderBy(col("source"))
    }
  }

  /** LIX + RIX per source: LIX = words/sentence + 100·long/words,
    * RIX = long words per sentence (long = > 6 chars). */
  def q1093: Q = {
    val lix = "((CAST(w AS DOUBLE) / CAST(sents AS DOUBLE))" +
      " + 100.0 * CAST(lw AS DOUBLE) / CAST(w AS DOUBLE))"
    val rix = "(CAST(lw AS DOUBLE) / CAST(sents AS DOUBLE))"
    Q("q1093_lix_rix",
      Some(s"""
        |WITH ${sqlM},
        |d AS (SELECT source, w, lw, ${milli(lix)} AS lm,
        |             ${milli(rix)} AS rm
        |      FROM m)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(lm) // count(*) AS BIGINT) AS mean_lix_milli,
        |       CAST(sum(rm) // count(*) AS BIGINT) AS mean_rix_milli,
        |       CAST((1000000 * sum(lw)) // sum(w) AS BIGINT)
        |         AS longword_share_ppm
        |FROM d GROUP BY source ORDER BY source
        |""".stripMargin)) { (s, dir) =>
      m(s, dir)
        .select(col("source"), col("w"), col("lw"),
          expr(milli(lix)).as("lm"), expr(milli(rix)).as("rm"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("lm")).as("slm"),
          sum(col("rm")).as("srm"), sum(col("lw")).as("slw"),
          sum(col("w")).as("sw"))
        .select(col("source"), col("n_docs"),
          expr("CAST(slm div n_docs AS BIGINT)").as("mean_lix_milli"),
          expr("CAST(srm div n_docs AS BIGINT)").as("mean_rix_milli"),
          expr("CAST((1000000 * slw) div sw AS BIGINT)")
            .as("longword_share_ppm"))
        .orderBy(col("source"))
    }
  }

  /** Gunning fog per source: 0.4·(words/sentence + 100·complex/words)
    * with complex = ≥ 3 vowel groups. */
  def q1094: Q = {
    val fog = "(0.4 * ((CAST(w AS DOUBLE) / CAST(sents AS DOUBLE))" +
      " + 100.0 * CAST(cw AS DOUBLE) / CAST(w AS DOUBLE)))"
    Q("q1094_gunning_fog",
      Some(s"""
        |WITH ${sqlM},
        |d AS (SELECT source, w, cw, ${milli(fog)} AS gm FROM m)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(gm) // count(*) AS BIGINT) AS mean_fog_milli,
        |       CAST((1000000 * sum(cw)) // sum(w) AS BIGINT)
        |         AS complex_share_ppm
        |FROM d GROUP BY source ORDER BY source
        |""".stripMargin)) { (s, dir) =>
      m(s, dir)
        .select(col("source"), col("w"), col("cw"),
          expr(milli(fog)).as("gm"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("gm")).as("sg"),
          sum(col("cw")).as("scw"), sum(col("w")).as("sw"))
        .select(col("source"), col("n_docs"),
          expr("CAST(sg div n_docs AS BIGINT)").as("mean_fog_milli"),
          expr("CAST((1000000 * scw) div sw AS BIGINT)")
            .as("complex_share_ppm"))
        .orderBy(col("source"))
    }
  }

  /** SMOG grade per source on POOLED counts (the formula is defined
    * over a sampled passage, so the source's pooled complex-word and
    * sentence totals stand in for it): 1.043·√(30·cw/sents) + 3.1291
    * — one shared-text double step over exact pooled integers. */
  def q1095: Q = {
    val smog = "(1.043 * sqrt(30.0 * CAST(scw AS DOUBLE)" +
      " / CAST(ssents AS DOUBLE)) + 3.1291)"
    Q("q1095_smog_grade",
      Some(s"""
        |WITH ${sqlM},
        |ag AS (SELECT source, count(*) AS n_docs, sum(cw) AS scw,
        |              sum(sents) AS ssents
        |       FROM m GROUP BY 1)
        |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
        |       CAST(scw AS BIGINT) AS complex_words,
        |       CAST(ssents AS BIGINT) AS sentences,
        |       ${milli(smog)} AS smog_milli
        |FROM ag ORDER BY source
        |""".stripMargin)) { (s, dir) =>
      m(s, dir)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("cw")).as("scw"),
          sum(col("sents")).as("ssents"))
        .select(col("source"), col("n_docs").cast("long").as("n_docs"),
          col("scw").cast("long").as("complex_words"),
          col("ssents").cast("long").as("sentences"),
          expr(milli(smog)).as("smog_milli"))
        .orderBy(col("source"))
    }
  }
}
