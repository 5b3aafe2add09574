package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher/C4-style document quality rules — the rule-based corpus
  * filtering stage of a training pipeline (Rae et al. 2021 "Scaling
  * Language Models" Table A1; Raffel et al. 2020 C4 heuristics),
  * re-expressed as pure column expressions over one scan.
  *
  * Exactness contract: every threshold is an INTEGER and every rule is
  * an integer cross-multiplication (e.g. "mean word length ≥ 3" becomes
  * `3 * n_words <= total_chars`), so no double ever enters a comparison
  * and the DuckDB oracle replays each flag bit-for-bit. This is not a
  * test convenience — rule-filter reproducibility across engines is the
  * property that lets a 100 TB corpus be re-filtered incrementally
  * without re-deriving the keep set.
  *
  * Scale shape: stateless scan-stage work, no shuffle, no UDFs; the
  * whole flag block lives in one WholeStageCodegen span and the line
  * rules reuse one `split` result across both line flags.
  */
object QualityRules {

  /** Integer-threshold rule set. Percent params are whole percents
    * (maxSymbolPct=10 means "≤ 10 symbols per 100 words"). */
  final case class GopherParams(
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMeanWordLen: Int = 3,
      maxMeanWordLen: Int = 10,
      maxSymbolPct: Int = 10,
      minAlphaWordPct: Int = 80,
      minStopwordHits: Int = 2,
      stopwords: Seq[String] = Seq("the", "a", "and", "of", "is", "to", "in"),
      maxBulletLinePct: Int = 10,
      maxEllipsisLinePct: Int = 30,
      blocklist: Seq[String] = Seq("lorem", "javascript"))

  /** Symbol pattern shared with the oracle: hash marks and ellipses. */
  val SymbolPattern = "#|\\.\\.\\.|…"
  /** A bullet line starts with -, * or • followed by whitespace. */
  val BulletPattern = "^\\s*[-*•]\\s"
  /** An ellipsis line ends with ... or … (trailing spaces allowed). */
  val EllipsisPattern = "(\\.\\.\\.|…)\\s*$"

  /** Attach per-rule boolean flags plus the conjunction `keep`.
    * Output columns: n_words, words_ok, word_len_ok, symbol_ok,
    * alpha_ok, stopword_ok, bullet_ok, ellipsis_ok, blocklist_ok, keep.
    */
  def gopherFlags(
      docs: DataFrame,
      textCol: String,
      p: GopherParams = GopherParams()): DataFrame = {
    val text = col(textCol)
    val toks = TextAnalysis.tokens(text)
    val lines = split(text, "\n")
    val nW = size(toks).cast("long")
    val nL = size(lines).cast("long")
    val totalChars =
      aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast("long"))
    val symbols = regexp_count(text, lit(SymbolPattern)).cast("long")
    val alphaWords =
      size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("long")
    val stopHits =
      size(filter(toks, t => t.isin(p.stopwords: _*))).cast("long")
    val bulletLines =
      size(filter(lines, l => l.rlike(BulletPattern))).cast("long")
    val ellipsisLines =
      size(filter(lines, l => l.rlike(EllipsisPattern))).cast("long")
    val blockHits =
      size(filter(toks, t => t.isin(p.blocklist: _*))).cast("long")

    val flags: Seq[(String, Column)] = Seq(
      "words_ok" -> (nW >= p.minWords && nW <= p.maxWords),
      "word_len_ok" -> (totalChars >= lit(p.minMeanWordLen.toLong) * nW &&
        totalChars <= lit(p.maxMeanWordLen.toLong) * nW),
      "symbol_ok" -> (symbols * 100L <= lit(p.maxSymbolPct.toLong) * nW),
      "alpha_ok" -> (alphaWords * 100L >= lit(p.minAlphaWordPct.toLong) * nW),
      "stopword_ok" -> (stopHits >= p.minStopwordHits),
      "bullet_ok" -> (bulletLines * 100L <= lit(p.maxBulletLinePct.toLong) * nL),
      "ellipsis_ok" ->
        (ellipsisLines * 100L <= lit(p.maxEllipsisLinePct.toLong) * nL),
      "blocklist_ok" -> (blockHits === 0L))

    val withFlags = flags.foldLeft(docs.withColumn("n_words", nW)) {
      case (df, (name, c)) => df.withColumn(name, c)
    }
    withFlags.withColumn("keep",
      flags.map(f => col(f._1)).reduce(_ && _))
  }

  /** C4-style LINE filtering: drop lines that fail the per-line rules
    * (too few words, bullet start, ellipsis end), reassemble the
    * survivors in order with '\n'. Docs whose every line drops come back
    * with empty text. Stateless scan-stage work like [[gopherFlags]];
    * the line order is positional, never resorted.
    */
  def cleanLines(
      docs: DataFrame,
      textCol: String,
      minLineWords: Int = 3): DataFrame = {
    val keepLine = (l: Column) =>
      size(filter(split(trim(l), "\\s+"), t => length(t) > 0)) >= minLineWords &&
        !l.rlike(BulletPattern) && !l.rlike(EllipsisPattern)
    docs.withColumn("clean_text",
      array_join(filter(split(col(textCol), "\n"), keepLine), "\n"))
  }
}
