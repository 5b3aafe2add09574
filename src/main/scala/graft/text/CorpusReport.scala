package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-source corpus data card — the composition report every released
  * training corpus ships with (doc/token/subtoken counts, tokenizer
  * fertility, token-length histogram, language spread). One pass, one
  * exchange on the source key with map-side partial aggregates.
  *
  * Determinism contract: every aggregate is an exact integer sum or
  * count; the only doubles are single divisions of exact sums
  * (bit-portable). No double is ever summed across rows — a mean of
  * per-doc doubles would make the report depend on partitioning.
  */
object CorpusReport {

  /** Histogram bin upper bounds (tokens per doc); the last bin is
    * open-ended. Part of the operator contract, replayed by the oracle. */
  val TokenBins: Seq[Long] = Seq(50L, 100L, 150L, 200L, 300L)

  private def binCol(n: Column, lo: Option[Long], hi: Option[Long]): Column = {
    val cond = (lo, hi) match {
      case (None, Some(h)) => n < h
      case (Some(l), Some(h)) => n >= l && n < h
      case (Some(l), None) => n >= l
      case _ => lit(true)
    }
    sum(when(cond, 1L).otherwise(0L))
  }

  /** One row per source: doc/token/subtoken totals, fertility
    * (subtokens per token, exact-sum division), per-bin doc counts, and
    * distinct language count. */
  def perSource(docs: DataFrame, srcCol: String, textCol: String,
      langCol: String): DataFrame = {
    val n = TextAnalysis.tokenCount(col(textCol))
    val bounds = (None +: TokenBins.map(Some(_))) zip
      (TokenBins.map(Some(_)) :+ None)
    val bins = bounds.zipWithIndex.map { case ((lo, hi), i) =>
      binCol(n, lo, hi).as(s"bin_${lo.getOrElse(0L)}_${hi.map(_.toString).getOrElse("inf")}")
    }
    val aggs = Seq(
      sum(n).as("n_tokens"),
      sum(TextAnalysis.bpeIshCount(col(textCol))).as("n_subtokens"),
      countDistinct(col(langCol)).as("n_langs")) ++ bins
    docs.groupBy(col(srcCol))
      .agg(count(lit(1)).as("n_docs"), aggs: _*)
      .withColumn("fertility",
        col("n_subtokens").cast("double") / col("n_tokens"))
  }
}
