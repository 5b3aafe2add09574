package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.operators.Relational

/** Duplicate n-gram span coverage — substring-level duplication
  * detection at shingle granularity, the scalable relational form of
  * Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
  * Better", which finds exact substrings of ≥ 50 tokens repeated across
  * a corpus via a suffix array). A suffix array is not a distributed-
  * friendly structure; the shingle form keeps the same signal — "which
  * token spans of this document also occur elsewhere" — as three plain
  * dataflow stages that each scale linearly:
  *
  *   1. explode each doc into word n-gram shingles with start positions;
  *   2. count each shingle corpus-wide (a shingle is DUPLICATED when its
  *      total occurrence count ≥ 2, within- or cross-document);
  *   3. per doc, union the flagged [start, start+n) spans into covered
  *      token counts with one lag-window pass over sorted starts
  *      (contribution = min(n, gap to previous flagged start)).
  *
  * Skew design: the shingle-count join is Zipf-skewed exactly like q67's
  * token join (stop-phrase shingles concentrate rows on few keys), so it
  * goes through [[Relational.hotTailJoin]] — hottest shingles broadcast,
  * tail shuffled — skew-proof by construction rather than by AQE's
  * grace. Shingle strings ride the shuffles only until the count join;
  * the window pass carries (doc_id, position) pairs.
  */
object DupSpans {

  /** Per-doc duplicate-span profile: token/shingle totals, number of
    * duplicated shingle positions, union'd covered token count, and the
    * covered fraction (exact int/int division — bit-portable).
    */
  def coverage(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      hotN: Int = 1024): DataFrame = {
    val sh = docs.select(col(idCol).as("doc_id"),
        posexplode(Dedup.shingles(col(textCol), n)).as(Seq("spos", "g")))
    val cnt = sh.groupBy(col("g")).agg(count(lit(1)).as("c"))
    val dup = Relational.hotTailJoin(
      sh, cnt.filter(col("c") >= 2), key = "g", weight = "c", hotN = hotN)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("spos"))
    val contrib = coalesce(
      least(lit(n), col("spos") - lag(col("spos"), 1).over(w)), lit(n))
    val perDoc = dup
      .withColumn("contrib", contrib)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_dup_shingles"),
        sum(col("contrib")).cast("long").as("covered_tokens"))
    val totals = docs.select(col(idCol).as("doc_id"),
      TextAnalysis.tokenCount(col(textCol)).as("n_tokens"),
      size(Dedup.shingles(col(textCol), n)).cast("long").as("n_shingles"))
    totals.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_shingles"),
        coalesce(col("n_dup_shingles"), lit(0L)).as("n_dup_shingles"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        (coalesce(col("covered_tokens"), lit(0L)).cast("double") /
          col("n_tokens")).as("dup_frac"))
  }
}
