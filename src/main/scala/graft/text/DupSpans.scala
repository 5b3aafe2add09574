package graft.text
import graft.Materialize.MatOps

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
    // stage boundary: ONLY the duplicated-shingle dim is materialized —
    // duplicate shingles only, far smaller than the vocabulary, and it
    // feeds hotTailJoin's three dim branches. The exploded shingle table
    // `sh` is deliberately NOT materialized: it is ~n× the corpus, so
    // writing it to block storage costs more than re-deriving the
    // explode from the (column-pruned) scan in each branch that needs
    // it — re-scan beats re-store for fan-outs.
    val sh = docs.select(col(idCol).as("doc_id"),
        posexplode(Dedup.shingles(col(textCol), n)).as(Seq("spos", "g")))
    val cnt = sh.groupBy(col("g")).agg(count(lit(1)).as("c"))
    val dupDim = cnt.filter(col("c") >= 2).materialize()
    val dup = Relational.hotTailJoin(
      sh, dupDim, key = "g", weight = "c", hotN = hotN)
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

  /** Duplicate-span REMOVAL — the surgical counterpart of [[coverage]]:
    * instead of dropping whole documents, delete exactly the token
    * positions covered by a corpus-duplicated shingle and reassemble
    * the survivors (Lee et al. 2022 remove the repeated substring, not
    * the document — removal preserves the unique remainder of partially
    * boilerplate pages that doc-level dedup would throw away).
    *
    * A position p in doc d is covered iff some duplicated shingle
    * starts at s ∈ (p-n, p]. Stages: flagged starts (same hotTailJoin
    * skew discipline as [[coverage]]) → `sequence(s, s+n-1)` fan-out →
    * distinct covered positions → left_anti against positioned tokens →
    * ordered re-aggregation. Everything between the count join and the
    * final build ships (doc_id, position) pairs only; token strings
    * ride exactly two shuffles (the shingle count and the rebuild —
    * the rebuild one is irreducible: reassembly IS a group-by-doc).
    *
    * Output: doc_id, n_tokens, kept_tokens, clean_text (survivors
    * joined with single spaces; empty string when everything was
    * duplicated). Whitespace normalizes to single spaces — positions,
    * not raw offsets, are the removal unit.
    */
  def removeSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      hotN: Int = 1024): DataFrame = {
    // stage boundary, as in [[coverage]]: only the duplicated-shingle
    // dim is materialized. `toks` carries the full tokens+shingles
    // arrays (≳2× the corpus) — storing it would cost more than
    // re-tokenizing from the pruned text scan in each branch, so each
    // branch re-derives its explode from the scan.
    val toks = docs.select(col(idCol).as("doc_id"),
      TextAnalysis.tokens(col(textCol)).as("toks"),
      Dedup.shingles(col(textCol), n).as("shl"))
    val sh = toks.select(col("doc_id"),
      posexplode(col("shl")).as(Seq("spos", "g")))
    val cnt = sh.groupBy(col("g")).agg(count(lit(1)).as("c"))
    val dupStarts = Relational.hotTailJoin(
      sh, cnt.filter(col("c") >= 2).materialize(),
      key = "g", weight = "c", hotN = hotN)
    val covered = dupStarts
      .select(col("doc_id"),
        explode(sequence(col("spos"), col("spos") + (n - 1))).as("tpos"))
      .distinct()
    val positioned = toks.select(col("doc_id"),
      posexplode(col("toks")).as(Seq("tpos", "tok")))
    val kept = positioned.join(covered, Seq("doc_id", "tpos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("kept_tokens"),
        array_join(
          transform(array_sort(collect_list(struct(col("tpos"), col("tok")))),
            s => s.getField("tok")), " ").as("clean_text"))
    toks.select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }
}
