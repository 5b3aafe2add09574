package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.PolyHash.polyHash

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization stats, quality scoring, language ID, fingerprinting.
  * Everything is a pure Column expression (no UDFs): whitespace
  * tokenization, ratios as exact int/int divisions, and higher-order array
  * functions — so the whole stage stays distributed, partition-agnostic
  * and reproducible bit-for-bit (the DuckDB oracle replays the same ops).
  */
object TextAnalysis {

  /** Whitespace tokens of trimmed text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword-unit count: the pre-tokenization pattern BPE
    * tokenizers apply before merges — runs of letters, runs of digits,
    * single other non-space symbols. A cheap, portable proxy for "how
    * many subword tokens will this cost" (the RE2/Java-regex-common
    * subset keeps the oracle exact). */
  val BpeIshPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"
  def bpeIshCount(text: Column): Column =
    regexp_count(text, lit(BpeIshPattern)).cast("long")

  /** Punctuation chars / total chars. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[^.!?,;:]", "")).cast("double") / length(text)

  /** Fraction of tokens that are common-word stopwords. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(text)
    countIn(toks, stopwords).cast("double") / size(toks)
  }

  /** Mean token length (chars per token, exact int/int division). */
  def avgTokenLen(text: Column): Column = {
    val toks = tokens(text)
    aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast("long"))
      .cast("double") / size(toks)
  }

  /** Composite quality score in [0, ~1]: rewards mid-length docs and
    * stopword presence, penalizes punctuation walls. Weights are part of
    * the operator contract (the oracle replays them).
    */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val stopScore = least(stopwordRatio(text, stopwords) * 5.0, lit(1.0))
    lenScore * 0.4 + stopScore * 0.4 + (lit(1.0) - punctRatio(text)) * 0.2
  }

  /** How many tokens fall in `words` (multiset count, not distinct). */
  private def countIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*)))

  /** Per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Deterministic priority order = declaration order.
    */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "is", "to", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist", "zu", "ein"),
    "fr" -> Seq("le", "la", "et", "est", "un", "une", "dans"),
    "es" -> Seq("el", "los", "y", "es", "un", "una", "en"),
    "zh" -> Seq("de", "shi", "le", "zai", "he", "you", "wo"))

  /** Stopword-hit language ID: argmax of per-language hit counts with
    * declaration-order tie-break; "und" (undetermined) when nothing hits.
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = LangStopwords.map { case (lang, words) => lang -> countIn(toks, words) }
    // argmax via chained CASE, first language with the max score wins:
    // lang_i is picked iff score_i >= every later score and > every earlier
    // (earlier branches of the CASE already claimed >= ties).
    scores.foldRight(lit("und")) { case ((lang, s), elseCol) =>
      val laterMax = scores.drop(scores.indexWhere(_._1 == lang) + 1).map(_._2)
      val beatsLater = laterMax.foldLeft(lit(true))((acc, s2) => acc && s >= s2)
      when(s > 0 && beatsLater, lit(lang)).otherwise(elseCol)
    }
  }

  /** Rolling-hash document fingerprint (content-addressed identity) via the
    * native codegen'd PolyHash expression.
    */
  def fingerprint(text: Column): Column = polyHash(trim(text))
}
