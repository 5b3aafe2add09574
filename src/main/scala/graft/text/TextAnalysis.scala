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

  /** Per-document token Shannon entropy — the repetitive/templated-text
    * signal quality pipelines pair with [[QualityRules]]: H = −Σ_t
    * (c_t/n)·ln(c_t/n) over the doc's OWN token distribution. A
    * boilerplate page repeating ten tokens scores ≪ a natural-language
    * page of the same length; H = 0 for single-token docs.
    *
    * Relational form (never a per-row set): explode → per-(doc, token)
    * count with map-side partials, per-doc total as a window over the
    * SAME doc partitioning (no extra exchange), then one per-doc sum.
    * ln crosses the non-portable libm ulp, so each term quantizes to
    * DECIMAL(18,9) and the cross-token sum is exact — the q98/q105
    * discipline; the oracle replays it verbatim (q141).
    *
    * Output: (doc_id, n_tokens, n_distinct, entropy).
    */
  def tokenEntropy(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val tf = df.select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("doc_id"))
    val p = col("c").cast("double") / col("n")
    tf.withColumn("n", sum(col("c")).over(w))
      .withColumn("term", (-p * log(p)).cast(DecimalType(18, 9)))
      .groupBy(col("doc_id"))
      .agg(max(col("n")).as("n_tokens"), // constant within the doc
        count(lit(1)).as("n_distinct"),
        sum(col("term")).cast("double").as("entropy"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        col("entropy"))
  }
}
