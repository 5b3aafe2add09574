package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables

/** Round-10 phonetic-blocking wave on the corpus vocabulary: a PORTABLE
  * Soundex (defined here, implemented identically in both engines —
  * Spark's builtin `soundex` is NOT used because its H/W adjacency
  * handling is engine-specific) blocks the part-name vocabulary, and
  * the wave audits the blocking: biggest blocks, collision pairs,
  * block-size distribution, and the phonetic-vs-exact dedup rate.
  *
  * graft-Soundex spec (simplified, H/W rule intentionally omitted so
  * the spec is regex-portable — RE2 has no backreferences, so runs
  * collapse with per-digit '<d>+' patterns):
  *   1. letters-only uppercase;
  *   2. map AEIOUYHW→0, BFPV→1, CGJKQSXZ→2, DT→3, L→4, MN→5, R→6;
  *   3. collapse adjacent equal digits;
  *   4. drop zeros, drop the first code, prefix the first LETTER,
  *      pad/truncate to 4.
  *
  * Scale: each source scans once and its token fan-out collapses
  * map-side into the vocabulary groupBy; everything downstream is
  * word-dim string arithmetic in the scan stage. */
object PhoneticQueries {

  val all: Seq[Q] = Seq(q991, q992, q993, q994, q995)

  /** The shared code-derivation, as SQL text over a column named `w`
    * (uppercase letters-only already). Emits the 4-char code.
    * `duck = true` appends the 'g' flag to every regexp_replace —
    * DuckDB replaces only the FIRST match by default where Spark
    * always replaces all (a silent divergence otherwise). */
  private def codeSql(w: String, duck: Boolean): String = {
    val g = if (duck) ", 'g'" else ""
    val mapped = s"translate($w, 'AEIOUYHWBFPVCGJKQSXZDTLMNR'," +
      " '00000000111122222222334556')"
    val collapsed = (0 to 6).foldLeft(mapped)((acc, d) =>
      s"regexp_replace($acc, '$d+', '$d'$g)")
    // drop the leading code (it belongs to the kept first letter),
    // then zeros, then pad to 3
    s"substring(concat(substring($w, 1, 1), " +
      s"replace(substring($collapsed, 2), '0', ''), '000'), 1, 4)"
  }

  /** Word dim + codes over the multi-source vocabulary (document
    * tokens, part-name words, nation/region names, market segments,
    * order-priority words): wd(w, cnt), cd(w, cnt, code). */
  private def sqlWd: String = s"""
    |u AS (
    |  SELECT unnest(string_split(upper(text), ' ')) AS w
    |  FROM documents
    |  UNION ALL SELECT unnest(string_split(upper(p_name), ' '))
    |  FROM part
    |  UNION ALL SELECT upper(n_name) FROM nation
    |  UNION ALL SELECT upper(r_name) FROM region
    |  UNION ALL SELECT upper(c_mktsegment) FROM customer
    |  UNION ALL SELECT unnest(string_split(upper(o_orderpriority), '-'))
    |  FROM orders),
    |wrd AS (SELECT regexp_replace(w, '[^A-Z]', '', 'g') AS w,
    |               count(*) AS cnt
    |        FROM u GROUP BY 1),
    |wd AS (SELECT w, cnt FROM wrd WHERE length(w) > 0),
    |cd AS MATERIALIZED (
    |  SELECT w, cnt, ${codeSql("w", duck = true)} AS code FROM wd)""".stripMargin

  /** Spark twin of the word + code dim (each source's fan-out
    * collapses map-side into the vocabulary groupBy). */
  private def codes(s: SparkSession, dir: String): DataFrame = {
    val u = Tables.documents(s, dir)
      .select(explode(split(upper(col("text")), " ")).as("w"))
      .unionAll(Tables.part(s, dir)
        .select(explode(split(upper(col("p_name")), " ")).as("w")))
      .unionAll(Tables.nation(s, dir).select(upper(col("n_name")).as("w")))
      .unionAll(Tables.region(s, dir).select(upper(col("r_name")).as("w")))
      .unionAll(Tables.customer(s, dir)
        .select(upper(col("c_mktsegment")).as("w")))
      .unionAll(Tables.orders(s, dir)
        .select(explode(split(upper(col("o_orderpriority")), "-")).as("w")))
    val wd = u.select(regexp_replace(col("w"), "[^A-Z]", "").as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .where(length(col("w")) > 0)
    wd.select(col("w"), col("cnt"),
        expr(codeSql("w", duck = false)).as("code"))
      .materialize() // vocabulary dim
  }

  /** Top-10 phonetic blocks by part count. */
  def q991: Q = Q(
    "q991_soundex_blocks",
    Some(s"""
      |WITH ${sqlWd}
      |SELECT code, CAST(sum(cnt) AS BIGINT) AS n_parts,
      |       CAST(count(*) AS BIGINT) AS n_words,
      |       min(w) AS example_word
      |FROM cd GROUP BY 1 ORDER BY n_parts DESC, code LIMIT 10
      |""".stripMargin)) { (s, dir) =>
    codes(s, dir).groupBy(col("code"))
      .agg(sum(col("cnt")).as("n_parts"), count(lit(1)).as("n_words"),
        min(col("w")).as("example_word"))
      .orderBy(col("n_parts").desc, col("code")).limit(10)
  }

  /** Collision blocks: codes shared by >1 distinct word. */
  def q992: Q = Q(
    "q992_phonetic_collisions",
    Some(s"""
      |WITH ${sqlWd}
      |SELECT code, CAST(count(*) AS BIGINT) AS n_words,
      |       min(w) AS word_a, max(w) AS word_b
      |FROM cd GROUP BY 1 HAVING count(*) > 1
      |ORDER BY n_words DESC, code
      |""".stripMargin)) { (s, dir) =>
    codes(s, dir).groupBy(col("code"))
      .agg(count(lit(1)).as("n_words"), min(col("w")).as("word_a"),
        max(col("w")).as("word_b"))
      .where(col("n_words") > 1)
      .orderBy(col("n_words").desc, col("code"))
  }

  /** Phonetic self-join: distinct word pairs sharing a code, counted
    * globally and by first letter. */
  def q993: Q = Q(
    "q993_phonetic_join_pairs",
    Some(s"""
      |WITH ${sqlWd},
      |pr AS (SELECT a.code, a.w AS wa, b.w AS wb,
      |              substring(a.code, 1, 1) AS fl
      |       FROM cd a JOIN cd b ON a.code = b.code AND a.w < b.w)
      |SELECT fl AS first_letter,
      |       CAST(count(*) AS BIGINT) AS n_pairs,
      |       CAST(count(DISTINCT code) AS BIGINT) AS n_blocks,
      |       min(wa) AS example_a,
      |       min(wb) AS example_b
      |FROM pr GROUP BY 1 ORDER BY first_letter
      |""".stripMargin)) { (s, dir) =>
    val cd = codes(s, dir)
    val b = cd.select(col("code").as("code2"), col("w").as("wb"))
    cd.join(b, col("code") === col("code2") && col("w") < col("wb"))
      .select(substring(col("code"), 1, 1).as("first_letter"),
        col("code"), col("w").as("wa"), col("wb"))
      .groupBy(col("first_letter"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("code")).as("n_blocks"),
        min(col("wa")).as("example_a"), min(col("wb")).as("example_b"))
      .orderBy(col("first_letter"))
  }

  /** Block-size distribution: how many codes hold k words. */
  def q994: Q = Q(
    "q994_block_size_distribution",
    Some(s"""
      |WITH ${sqlWd},
      |bs AS (SELECT code, count(*) AS k FROM cd GROUP BY 1)
      |SELECT CAST(k AS BIGINT) AS block_size,
      |       CAST(count(*) AS BIGINT) AS n_blocks
      |FROM bs GROUP BY 1 ORDER BY block_size
      |""".stripMargin)) { (s, dir) =>
    codes(s, dir).groupBy(col("code")).agg(count(lit(1)).as("k"))
      .groupBy(col("k").as("block_size"))
      .agg(count(lit(1)).as("n_blocks"))
      .orderBy(col("block_size"))
  }

  /** Phonetic vs exact dedup rate over the vocabulary. */
  def q995: Q = Q(
    "q995_phonetic_dedup_rate",
    Some(s"""
      |WITH ${sqlWd}
      |SELECT CAST(count(*) AS BIGINT) AS n_exact_words,
      |       CAST(count(DISTINCT code) AS BIGINT) AS n_phonetic_blocks,
      |       CAST((1000 * count(DISTINCT code)) // count(*) AS BIGINT)
      |         AS keep_milli
      |FROM cd
      |""".stripMargin)) { (s, dir) =>
    codes(s, dir)
      .agg(count(lit(1)).as("n_exact_words"),
        countDistinct(col("code")).as("n_phonetic_blocks"))
      .select(col("n_exact_words"), col("n_phonetic_blocks"),
        expr("CAST((1000 * n_phonetic_blocks) div n_exact_words" +
          " AS BIGINT)").as("keep_milli"))
  }
}
