package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables

/** Round-10 corpus-diversity wave (the self-BLEU-style leave-one-out
  * audit the dedup faces don't cover): a document's DERIVATIVE share
  * is the fraction of its distinct bigrams that also occur in some
  * OTHER document (document frequency ≥ 2 — exact leave-one-out,
  * since df counts documents). Faces: the corpus overlap histogram,
  * the most derivative documents, novelty by source, the bigram-df
  * head, and the novelty-vs-length correlation.
  *
  * Exactness: bigram extraction is the same index arithmetic both
  * engines (0-based Spark `tokens[i]`, 1-based DuckDB `t[i]` with
  * shifted ranges); shares are exact ppm rationals; the correlation
  * quantizes exact integer moments through one double formula.
  *
  * Scale: one documents scan fans out to (doc, bigram) and collapses
  * by DISTINCT in the same shuffle; df is one grouped count over the
  * bigram vocabulary; the doc-level profile is one join of the
  * posting frame against the vocab-sized df dim — the postings
  * discipline, nothing is ever broadcast at corpus size. */
object CorpusDiversityQueries {

  val all: Seq[Q] = Seq(q1011, q1012, q1013, q1014, q1015)

  /** Postings + df + per-doc profile CTEs: dbg(doc_id, bg),
    * df(bg, df), prof(doc_id, n_bg, n_shared). */
  private def sqlProf: String = """
    |tk AS (SELECT doc_id, string_split(lower(text), ' ') AS t
    |       FROM documents),
    |dbg AS MATERIALIZED (
    |  SELECT DISTINCT doc_id,
    |         unnest(list_transform(range(1, len(t)),
    |                i -> t[i] || ' ' || t[i + 1])) AS bg
    |  FROM tk WHERE len(t) >= 2),
    |dfq AS (SELECT bg, count(*) AS df FROM dbg GROUP BY 1),
    |prof AS MATERIALIZED (
    |  SELECT dbg.doc_id, count(*) AS n_bg,
    |         sum(CASE WHEN dfq.df >= 2 THEN 1 ELSE 0 END) AS n_shared
    |  FROM dbg JOIN dfq USING (bg) GROUP BY 1)""".stripMargin

  /** Spark twin: per-doc profile (doc_id, n_bg, n_shared) — a
    * [[graft.sources.SpineCache]] SPINE TABLE (VERDICT r10 #2): four
    * of the five wave queries consume exactly this doc-dim frame, and
    * each previously re-ran the posting fan-out + df join to build
    * it. One fingerprint-keyed parquet build; the oracle keeps the
    * inline CTEs so the gate proves cache ≡ from-scratch. */
  private def profile(s: SparkSession, dir: String): DataFrame =
    graft.sources.SpineCache.table(s, dir, "bigram_profile",
      Seq("documents")) {
      val dbg = Tables.documents(s, dir)
        .select(col("doc_id"), split(lower(col("text")), " ").as("t"))
        .where(size(col("t")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(t) - 2)," +
            " i -> concat(t[i], ' ', t[i + 1]))")).as("bg"))
        .distinct()
        .materialize() // (doc, bigram) posting frame
      val df = dbg.groupBy(col("bg")).agg(count(lit(1)).as("df"))
      dbg.join(df, "bg")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bg"),
          sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_shared"))
    }

  /** Corpus overlap histogram: docs per derivative-share decile. */
  def q1011: Q = Q(
    "q1011_overlap_deciles",
    Some(s"""
      |WITH ${sqlProf}
      |SELECT CAST((10 * n_shared) // n_bg AS BIGINT) AS decile,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(n_bg) AS BIGINT) AS total_bigrams
      |FROM prof GROUP BY 1 ORDER BY decile
      |""".stripMargin)) { (s, dir) =>
    profile(s, dir)
      .groupBy(expr("(10 * n_shared) div n_bg").as("decile"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_bg")).as("total_bigrams"))
      .orderBy(col("decile"))
  }

  /** The 10 most derivative documents. */
  def q1012: Q = Q(
    "q1012_most_derivative_docs",
    Some(s"""
      |WITH ${sqlProf}
      |SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |       CAST(n_bg AS BIGINT) AS n_bigrams,
      |       CAST(n_shared AS BIGINT) AS n_shared,
      |       CAST((1000000 * n_shared) // n_bg AS BIGINT)
      |         AS derivative_ppm
      |FROM prof ORDER BY derivative_ppm DESC, doc_id LIMIT 10
      |""".stripMargin)) { (s, dir) =>
    profile(s, dir)
      .select(col("doc_id"), col("n_bg").as("n_bigrams"),
        col("n_shared"),
        expr("CAST((1000000 * n_shared) div n_bg AS BIGINT)")
          .as("derivative_ppm"))
      .orderBy(col("derivative_ppm").desc, col("doc_id")).limit(10)
  }

  /** Novelty by source: mean derivative share per document source. */
  def q1013: Q = Q(
    "q1013_novelty_by_source",
    Some(s"""
      |WITH ${sqlProf}
      |SELECT d.source,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum((1000 * prof.n_shared) // prof.n_bg)
      |            // count(*) AS BIGINT) AS mean_derivative_milli,
      |       CAST(min((1000 * prof.n_shared) // prof.n_bg) AS BIGINT)
      |         AS min_derivative_milli
      |FROM prof JOIN documents d USING (doc_id)
      |GROUP BY 1 ORDER BY source
      |""".stripMargin)) { (s, dir) =>
    val src = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"))
    profile(s, dir).join(src, "doc_id")
      .select(col("source"),
        expr("(1000 * n_shared) div n_bg").as("dm"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dm")).as("sdm"),
        min(col("dm")).as("min_derivative_milli"))
      .select(col("source"), col("n_docs"),
        expr("CAST(sdm div n_docs AS BIGINT)")
          .as("mean_derivative_milli"),
        col("min_derivative_milli"))
      .orderBy(col("source"))
  }

  /** The bigram document-frequency head. */
  def q1014: Q = Q(
    "q1014_bigram_df_head",
    Some(s"""
      |WITH ${sqlProf}
      |SELECT bg AS bigram, CAST(df AS BIGINT) AS doc_freq
      |FROM dfq ORDER BY df DESC, bg LIMIT 10
      |""".stripMargin)) { (s, dir) =>
    val dbg = Tables.documents(s, dir)
      .select(col("doc_id"), split(lower(col("text")), " ").as("t"))
      .where(size(col("t")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(t) - 2)," +
          " i -> concat(t[i], ' ', t[i + 1]))")).as("bg"))
      .distinct()
    dbg.groupBy(col("bg").as("bigram")).agg(count(lit(1)).as("doc_freq"))
      .orderBy(col("doc_freq").desc, col("bigram")).limit(10)
  }

  /** Novelty vs length: Pearson (milli) of (n_chars, derivative_ppm)
    * over documents — do long documents plagiarize more? */
  def q1015: Q = Q(
    "q1015_novelty_length_corr",
    Some(s"""
      |WITH ${sqlProf},
      |xy AS (SELECT CAST(d.n_chars AS HUGEINT) AS x,
      |              CAST((1000000 * prof.n_shared) // prof.n_bg
      |                   AS HUGEINT) AS y
      |       FROM prof JOIN documents d USING (doc_id)),
      |mo AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
      |              sum(x * y) AS sxy, sum(x * x) AS sxx,
      |              sum(y * y) AS syy
      |       FROM xy)
      |SELECT CAST(n AS BIGINT) AS n_docs,
      |       CAST(CASE WHEN (n * sxx - sx * sx) = 0
      |                   OR (n * syy - sy * sy) = 0 THEN NULL
      |            ELSE floor(1000.0 * (CAST(n * sxy - sx * sy AS DOUBLE)
      |                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
      |                      * CAST(n * syy - sy * sy AS DOUBLE))))
      |            END AS BIGINT) AS corr_milli
      |FROM mo
      |""".stripMargin)) { (s, dir) =>
    val d = Tables.documents(s, dir).select(col("doc_id"), col("n_chars"))
    profile(s, dir).join(d, "doc_id")
      .select(col("n_chars").cast("decimal(38,0)").as("x"),
        expr("CAST((1000000 * n_shared) div n_bg AS DECIMAL(38,0))")
          .as("y"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("n").cast("long").as("n_docs"),
        expr("""CAST(CASE WHEN (n * sxx - sx * sx) = 0
          |            OR (n * syy - sy * sy) = 0 THEN NULL
          |  ELSE floor(1000.0 * (CAST(n * sxy - sx * sy AS DOUBLE)
          |       / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
          |            * CAST(n * syy - sy * sy AS DOUBLE))))
          |  END AS BIGINT)""".stripMargin).as("corr_milli"))
  }
}
