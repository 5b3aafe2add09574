package graft.text
import graft.Materialize.MatOps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Relational

/** DSIR-lite data selection — importance weighting of a raw corpus
  * toward a target domain (Xie et al. 2023 "Data Selection for Language
  * Models via Importance Resampling"), with the likelihood ratio kept
  * EXACT instead of floating: per-token weight
  *
  *   w(tok) = ⌊1e6 · t(tok)·R / (r(tok)·T)⌋
  *
  * where t/r are Laplace-smoothed (+1) target/raw token counts and T/R
  * the corresponding totals — q67's scaled-integer trick applied to the
  * DSIR ratio, so the score is a BIGINT sum both engines reproduce
  * bit-for-bit (DSIR's log-sum is a monotone transform of the product
  * this sum approximates term-by-term; ranking-faithful in practice and
  * exactly reproducible, which the float log-sum is not).
  *
  * Scale shape: per-doc token frequencies pre-aggregate BEFORE any join
  * (the q67 discipline — the vocab join ships one row per distinct
  * (doc, tok), not per occurrence); the raw-count and target-count
  * attaches are Zipf-skew-proof via [[Relational.hotTailJoin]]; T and R
  * are one-row aggregates attached by a broadcast cross join. The two
  * intermediates every downstream branch re-reads — `tf` (one row per
  * distinct (doc, tok), feeding the vocab aggregate AND the scored fact
  * side) and `w` (vocab-sized, feeding hotTailJoin's three dim
  * branches) — are materialized with an eager localCheckpoint, so the
  * corpus text is tokenized exactly ONCE no matter how many plan
  * branches fan out of them (without it the raw-text scan re-runs once
  * per branch — 16 corpus scans in the q87 physical plan). The
  * checkpointed rows are counts, far smaller than the text they
  * summarize; the cost is that a lost executor fails the query instead
  * of recomputing (acceptable for a batch scoring pass — rerun).
  * Overflow
  * headroom: 1e6·t·R needs t·R < 9.2e12, i.e. fine to ~3e6-token
  * targets at any raw size when t ≪ R; past that, lift the interior
  * arithmetic to DECIMAL(38,0) (both engines sum decimals exactly) —
  * the contract, not the type, is the operator.
  */
object Dsir {

  /** Attach `dsir_score` (BIGINT Σ c_doc(tok)·w(tok)) and
    * `dsir_per_token` (one exact final division) to every doc.
    * `isTarget` marks the target-domain rows of `docs` (they are
    * scored too — a doc can be both evidence and candidate).
    */
  def importanceScores(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      targetPredicate: org.apache.spark.sql.Column,
      hotN: Int = 1024): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
        targetPredicate.as("is_target"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    // per-doc frequencies FIRST: everything downstream is per distinct tok.
    // Stage boundary: tf feeds the vocab aggregate AND the scored fact
    // side — checkpoint so tokenization runs once (see scaladoc)
    val tf = toks.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("c"), max(col("is_target")).as("is_target"))
      .materialize()
    val raw = tf.groupBy(col("tok"))
      .agg((sum(col("c")) + 1L).as("r"),
        (sum(when(col("is_target"), col("c")).otherwise(0L)) + 1L).as("t"))
    val totals = raw.agg(sum(col("r")).as("bigR"), sum(col("t")).as("bigT"))
    // stage boundary: vocab-sized, read by hotTailJoin's three dim branches
    val weighted = raw.crossJoin(broadcast(totals))
      .select(col("tok"), col("r"),
        expr("(1000000 * t * bigR) div (r * bigT)").as("w"))
      .materialize()
    val scored = Relational.hotTailJoin(
        tf.select(col("doc_id"), col("tok"), col("c")),
        weighted, key = "tok", weight = "r", hotN = hotN)
      .groupBy(col("doc_id"))
      .agg(sum(col("c") * col("w")).cast("long").as("dsir_score"),
        sum(col("c")).cast("long").as("n_tokens"))
    scored.select(col("doc_id"), col("n_tokens"), col("dsir_score"),
      (col("dsir_score").cast("double") / col("n_tokens"))
        .as("dsir_per_token"))
  }
}
