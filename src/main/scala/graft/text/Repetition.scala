package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Repetition-based quality signals for training-corpus filtering — the
  * "repetitious documents are low-quality" family of heuristics from the
  * published MassiveText/Gopher filtering rules (Rae et al. 2021, table A1):
  * what fraction of a document is the same token or word-bigram repeated.
  *
  * Shape at scale: explode → two-level aggregate. The (doc_id, gram)
  * partial counts combine map-side before the one exchange on
  * (doc_id, gram); the per-doc rollup then re-uses the same doc_id
  * clustering, and everything downstream is one small row per document.
  * No UDFs, no arrays carried through a shuffle.
  */
object Repetition {

  /** Word bigrams ("w1 w2") of a token array; empty below 2 tokens.
    * (Guarded because Spark's sequence(a, b) DESCENDS when b < a.)
    */
  def bigrams(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))

  /** Per-document repetition profile:
    *  - n_tokens        — whitespace token count;
    *  - distinct_frac   — distinct tokens / tokens (low = repetitious);
    *  - top_token_frac  — occurrences of the most frequent token / tokens;
    *  - top_bigram_frac — occurrences of the most frequent word bigram /
    *                      bigram count, NULL when the doc has < 2 tokens.
    * All fractions are exact int/int divisions (bit-identical on any
    * engine; see the q60 oracle).
    */
  def profile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
      TextAnalysis.tokens(col(textCol)).as("toks"))
    val tokProf = toks.select(col("doc_id"), explode(col("toks")).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id").agg(
        sum("cnt").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max("cnt").as("top_cnt"))
    val biProf = toks.select(col("doc_id"), explode(bigrams(col("toks"))).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id").agg(max("cnt").as("top_bi_cnt"))
    tokProf.join(biProf, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_tokens"),
        (col("n_distinct").cast("double") / col("n_tokens")).as("distinct_frac"),
        (col("top_cnt").cast("double") / col("n_tokens")).as("top_token_frac"),
        (col("top_bi_cnt").cast("double") / (col("n_tokens") - 1)).as("top_bigram_frac"))
  }
}
