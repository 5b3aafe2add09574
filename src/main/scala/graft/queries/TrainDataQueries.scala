package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Materialize.MatOps
import graft.Tables
import graft.text.TextAnalysis

/** Round-9 training-data audit wave: tokenizer fertility by language,
  * a Hill tail-index estimate of document lengths, a stopword-profile
  * homogeneity χ² across sources, the dedup-pressure histogram
  * (cluster sizes → docs/tokens saved), and per-source unigram entropy
  * with the effective-vocabulary size. All token machinery reuses the
  * proven portable idioms (whitespace tokens, the RE2/Java-common
  * BPE-ish pattern, the 62-bit content fingerprint); entropies and
  * logs are quantized per term before exact sums. */
object TrainDataQueries {

  val all: Seq[Q] = Seq(q676, q677, q678, q679, q680)

  private def sqlTokens(src: String) =
    s"regexp_split_to_array(trim($src), '\\s+')"

  /** Tokenizer fertility by DECLARED LANGUAGE: BPE-ish subword units
    * per whitespace token — the "how much more will tokenization cost
    * for language X" table a multilingual data pipeline budgets with
    * (q83 reports it per source; the language axis is the one
    * tokenizer vendors quote). Exact integer counts, one scan. */
  def q676: Q = Q(
    "q676_fertility_by_lang",
    Some(s"""
      |WITH t AS (
      |  SELECT lang, len(${sqlTokens("text")}) AS tok,
      |         CAST(len(regexp_extract_all(text,
      |           '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS BIGINT) AS sub
      |  FROM documents)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(tok) AS BIGINT) AS n_tokens,
      |       CAST(sum(sub) AS BIGINT) AS n_subtokens,
      |       CAST((1000 * sum(sub)) // sum(tok) AS BIGINT)
      |         AS fertility_milli
      |FROM t GROUP BY 1 ORDER BY 1
      |""".stripMargin)) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("lang"),
        TextAnalysis.tokenCount(col("text")).as("tok"),
        TextAnalysis.bpeIshCount(col("text")).as("sub"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"),
        sum(col("sub")).as("n_subtokens"))
      .select(col("lang"), col("n_docs"), col("n_tokens"),
        col("n_subtokens"),
        expr("(1000 * n_subtokens) div n_tokens").as("fertility_milli"))
      .orderBy(col("lang"))
  }

  /** Hill tail-index estimate of the document-length distribution
    * (m = 50): α̂ = m / Σ_{i≤m} ln(x_(i)/x_(m+1)) over the top-51
    * lengths — the heavy-tail diagnostic that decides whether a
    * max-length cap truncates meaningful mass. Top-51 via
    * orderBy+limit (TakeOrdered — never a global rank window); each
    * ln term micro-quantized, the estimate an exact integer ratio.
    * Zero-spread tails (all 51 equal) are out of domain → NULL. */
  def q677: Q = {
    val m = 50
    Q("q677_hill_tail_index",
      Some(s"""
        |WITH top AS (
        |  SELECT n_chars FROM documents
        |  ORDER BY n_chars DESC, doc_id LIMIT ${m + 1}),
        |rk AS (
        |  SELECT n_chars, row_number() OVER (ORDER BY n_chars DESC)
        |           AS r
        |  FROM top),
        |xmin AS (SELECT n_chars AS x0 FROM rk WHERE r = ${m + 1}),
        |terms AS (
        |  SELECT CAST(floor(CAST(ln(CAST(rk.n_chars AS DOUBLE)
        |           / CAST(xmin.x0 AS DOUBLE)) AS DECIMAL(28,9))
        |           * 1000000) AS BIGINT) AS lnq
        |  FROM rk CROSS JOIN xmin WHERE rk.r <= $m),
        |agg AS (SELECT sum(lnq) AS sl FROM terms)
        |SELECT CAST($m AS BIGINT) AS m,
        |       CAST((SELECT x0 FROM xmin) AS BIGINT) AS xmin_chars,
        |       CAST(sl AS BIGINT) AS sum_ln_micro,
        |       CAST(CASE WHEN sl <= 0 THEN NULL
        |            ELSE ${1000L * 1000000L * m} // sl END AS BIGINT)
        |         AS hill_alpha_milli
        |FROM agg
        |""".stripMargin)) { (s, dir) =>
      val top = Tables.documents(s, dir)
        .select(col("n_chars"), col("doc_id"))
        .orderBy(col("n_chars").desc, col("doc_id"))
        .limit(m + 1)
      val rk = top.withColumn("r",
        row_number().over(Window.orderBy(col("n_chars").desc,
          col("doc_id")))) // 51-row frame
      val xmin = rk.where(col("r") === m + 1)
        .select(col("n_chars").as("x0"))
      val agg = rk.where(col("r") <= m)
        .crossJoin(broadcast(xmin))
        .select(expr("""CAST(floor(CAST(ln(CAST(n_chars AS DOUBLE)
            / CAST(x0 AS DOUBLE)) AS DECIMAL(28,9)) * 1000000)
          AS BIGINT)""").as("lnq"))
        .agg(sum(col("lnq")).as("sl"))
      agg.crossJoin(broadcast(xmin))
        .select(lit(m.toLong).as("m"), col("x0").as("xmin_chars"),
          col("sl").as("sum_ln_micro"),
          expr(s"CAST(CASE WHEN sl <= 0 THEN NULL" +
            s" ELSE ${1000L * 1000000L * m} div sl END AS BIGINT)")
            .as("hill_alpha_milli"))
    }
  }

  /** Stopword-profile homogeneity χ² across sources: the
    * source × language-stopword-family contingency of token hits,
    * χ² = Σ (N·o − r·c)²/(N·r·c) with every cell term micro-quantized
    * over exact counts — "do all sources draw from the same language
    * mix" (a drifted source fails this before it fails eval). The
    * cell frame is sources × 5 language lists — dim-sized. */
  def q678: Q = {
    val langs = TextAnalysis.LangStopwords
    def inList(words: Seq[String]) =
      words.map(w => s"'$w'").mkString("(", ", ", ")")
    val hitCols = langs.map { case (lang, words) =>
      s"len(list_filter(toks, x -> x IN ${inList(words)})) AS h_$lang"
    }.mkString(", ")
    val unpiv = langs.map { case (lang, _) =>
      s"SELECT source, '$lang' AS lst, sum(h_$lang) AS o FROM h GROUP BY 1"
    }.mkString("\n  UNION ALL ")
    // zero marginals (a language list no source ever hits) carry o = 0
    // and a zero expected count — their cells contribute 0 by
    // convention; the bare formula would divide by zero (Spark ANSI
    // throws, DuckDB infs)
    val term = "CASE WHEN r = 0 OR c = 0 THEN 0 ELSE" +
      " CAST(floor((CAST(n AS DOUBLE) * CAST(o AS DOUBLE)" +
      " - CAST(r AS DOUBLE) * CAST(c AS DOUBLE))" +
      " * (CAST(n AS DOUBLE) * CAST(o AS DOUBLE)" +
      " - CAST(r AS DOUBLE) * CAST(c AS DOUBLE))" +
      " / (CAST(n AS DOUBLE) * CAST(r AS DOUBLE) * CAST(c AS DOUBLE))" +
      " * 1000000.0) AS BIGINT) END"
    Q("q678_stopword_profile_chi2",
      Some(s"""
        |WITH d AS (SELECT source, ${sqlTokens("text")} AS toks
        |           FROM documents),
        |h AS (SELECT source, $hitCols FROM d),
        |cells AS (
        |  $unpiv),
        |rs AS (SELECT source, sum(o) AS r FROM cells GROUP BY 1),
        |cs AS (SELECT lst, sum(o) AS c FROM cells GROUP BY 1),
        |tt AS (SELECT sum(o) AS n FROM cells),
        |tm AS (
        |  SELECT $term AS t
        |  FROM cells JOIN rs ON rs.source = cells.source
        |       JOIN cs ON cs.lst = cells.lst CROSS JOIN tt)
        |SELECT CAST((SELECT n FROM tt) AS BIGINT) AS n_hits,
        |       CAST((SELECT count(*) FROM rs) AS BIGINT) AS n_sources,
        |       CAST((SELECT (count(*) - 1) FROM rs)
        |            * ${langs.size - 1} AS BIGINT) AS df,
        |       CAST(sum(t) // 1000 AS BIGINT) AS chi2_milli
        |FROM tm
        |""".stripMargin)) { (s, dir) =>
      val toks = TextAnalysis.tokens(col("text"))
      val hits = langs.map { case (lang, words) =>
        sum(size(filter(toks, t => t.isin(words: _*)))).as(s"h_$lang")
      }
      val h = Tables.documents(s, dir)
        .groupBy(col("source"))
        .agg(hits.head, hits.tail: _*)
        .materialize() // source dim
      val cells = langs.map { case (lang, _) =>
        h.select(col("source"), lit(lang).as("lst"),
          col(s"h_$lang").cast("long").as("o"))
      }.reduce(_ unionAll _)
        .materialize() // sources × 5 cells
      val rs = cells.groupBy(col("source")).agg(sum(col("o")).as("r"))
      val cs = cells.groupBy(col("lst")).agg(sum(col("o")).as("c"))
      val tt = cells.agg(sum(col("o")).as("n"))
      val nS = rs.agg(count(lit(1)).as("ns"))
      cells.join(broadcast(rs), Seq("source"))
        .join(broadcast(cs), Seq("lst"))
        .crossJoin(broadcast(tt))
        .select(expr(term).as("t"))
        .agg(sum(col("t")).as("st"))
        .crossJoin(broadcast(tt))
        .crossJoin(broadcast(nS))
        .select(col("n").as("n_hits"), col("ns").as("n_sources"),
          ((col("ns") - 1) * lit(langs.size - 1).cast("long")).as("df"),
          expr("st div 1000").as("chi2_milli"))
    }
  }

  /** Dedup-pressure histogram: exact-duplicate cluster sizes (the
    * 62-bit content fingerprint, q26's contract) with the documents
    * and TOKENS a keep-one dedup saves per size — the data-card table
    * that justifies paying for dedup at all. Fingerprint-only
    * shuffles; token counts ride the scan. */
  def q679: Q = Q(
    "q679_dedup_pressure",
    Some(s"""
      |WITH fp AS (
      |  SELECT doc_id,
      |         ${PipelineQueries.sqlContentFp("trim(text)")} AS fp,
      |         len(${sqlTokens("text")}) AS tok
      |  FROM documents),
      |cl AS (
      |  SELECT fp, count(*) AS sz, sum(tok) AS st, max(tok) AS mt
      |  FROM fp GROUP BY 1 HAVING count(*) >= 2)
      |SELECT CAST(sz AS BIGINT) AS cluster_size,
      |       CAST(count(*) AS BIGINT) AS n_clusters,
      |       CAST(sum(sz - 1) AS BIGINT) AS docs_saved,
      |       CAST(sum(st - mt) AS BIGINT) AS tokens_saved
      |FROM cl GROUP BY 1 ORDER BY 1
      |""".stripMargin)) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"),
        graft.dedup.Dedup.contentFingerprint(trim(col("text"))).as("fp"),
        TextAnalysis.tokenCount(col("text")).as("tok"))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("sz"), sum(col("tok")).as("st"),
        max(col("tok")).as("mt"))
      .where(col("sz") >= 2)
      .groupBy(col("sz").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("sz") - 1).as("docs_saved"),
        sum(col("st") - col("mt")).as("tokens_saved"))
      .orderBy(col("cluster_size"))
  }

  /** Per-source unigram entropy and EFFECTIVE vocabulary size
    * exp(H) — "how many equally-likely tokens is this source really
    * using" (the perplexity of its own unigram distribution; far
    * below the raw vocab count for skewed sources). Entropy terms
    * micro-nat-quantized per token type before the exact sum; the
    * vocab dim is tiny (31 distinct tokens in the synthetic corpus,
    * bounded in general by vocabulary, not corpus). */
  def q680: Q = {
    def lnq(x: String) =
      s"CAST(floor(CAST(ln($x) AS DECIMAL(28,9)) * 1000000) AS BIGINT)"
    val h = "CAST((-hsum) // t AS BIGINT)"
    Q("q680_effective_vocab",
      Some(s"""
        |WITH tok AS (
        |  SELECT source, unnest(${sqlTokens("text")}) AS w
        |  FROM documents),
        |cw AS (SELECT source, w, count(*) AS c FROM tok GROUP BY 1, 2),
        |ts AS (SELECT source, sum(c) AS t, count(*) AS v
        |       FROM cw GROUP BY 1),
        |hs AS (
        |  SELECT cw.source,
        |         sum(cw.c * ${lnq("CAST(cw.c AS DOUBLE)" +
        " / CAST(ts.t AS DOUBLE)")}) AS hsum
        |  FROM cw JOIN ts ON ts.source = cw.source GROUP BY 1)
        |SELECT ts.source, CAST(ts.t AS BIGINT) AS n_tokens,
        |       CAST(ts.v AS BIGINT) AS vocab,
        |       CAST($h AS BIGINT) AS entropy_micro,
        |       CAST(floor(exp(CAST($h AS DOUBLE) / 1000000.0) * 1000.0)
        |            AS BIGINT) AS eff_vocab_milli
        |FROM ts JOIN hs ON hs.source = ts.source
        |ORDER BY ts.source
        |""".stripMargin)) { (s, dir) =>
      val cw = Tables.documents(s, dir)
        .select(col("source"),
          explode(TextAnalysis.tokens(col("text"))).as("w"))
        .groupBy(col("source"), col("w"))
        .agg(count(lit(1)).as("c"))
        .materialize() // source × vocab dim
      val ts = cw.groupBy(col("source"))
        .agg(sum(col("c")).as("t"), count(lit(1)).as("v"))
        .materialize()
      def lnqS(x: String) =
        s"CAST(floor(CAST(ln($x) AS DECIMAL(28,9)) * 1000000) AS BIGINT)"
      val hs = cw.join(broadcast(ts), Seq("source"))
        .select(col("source"), (col("c") * expr(lnqS(
          "CAST(c AS DOUBLE) / CAST(t AS DOUBLE)"))).as("hc"))
        .groupBy(col("source")).agg(sum(col("hc")).as("hsum"))
      ts.join(hs, Seq("source"))
        .select(col("source"), col("t").as("n_tokens"),
          col("v").as("vocab"),
          expr(h.replace("//", "div")).as("entropy_micro"),
          expr(s"CAST(floor(exp(CAST(${h.replace("//", "div")} AS DOUBLE)" +
            " / 1000000.0) * 1000.0) AS BIGINT)").as("eff_vocab_milli"))
        .orderBy(col("source"))
    }
  }
}
