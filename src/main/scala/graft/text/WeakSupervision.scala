package graft.text

import graft.Materialize.MatOps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weak-supervision vote aggregation (the Snorkel labeling-function
  * pattern): k cheap deterministic rules each vote keep(+1) /
  * abstain(0) / drop(−1) per document, and the aggregate — counts,
  * majority label, margin — becomes the training signal (or the
  * routing decision: high-margin docs auto-resolve, low-margin go to
  * review). The rules themselves are ordinary Column predicates, so
  * the whole vote matrix evaluates in the SCAN stage; nothing here is
  * model-based or float-valued.
  *
  * Majority semantics: keep if strictly more +1 than −1, drop if
  * strictly more −1, abstain on ties (including all-abstain) — the
  * deterministic tie rule a downstream label model can rely on.
  *
  * Scale shape: zero exchanges — per-row arithmetic over the rule
  * columns; the output is input + 4 columns. Aggregating per-rule
  * coverage/conflict statistics afterwards is one group-by over the
  * long vote table (see [[voteMatrix]]).
  */
object WeakSupervision {

  /** Attach (n_keep, n_drop, majority, margin) for rule columns each
    * valued in {−1, 0, +1}. majority ∈ {"keep", "drop", "abstain"};
    * margin = |n_keep − n_drop|. A rule value outside {−1,0,1} fails
    * loudly. */
  def voteAggregate(df: DataFrame, rules: Seq[Column]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    val checked = rules.map(r =>
      when(r.isin(-1, 0, 1), r.cast("long"))
        .otherwise(raise_error(lit(
          "WeakSupervision: rule vote outside {-1,0,1}")).cast("long")))
    val nKeep = checked.map(r => when(r === 1L, 1L).otherwise(0L))
      .reduce(_ + _)
    val nDrop = checked.map(r => when(r === -1L, 1L).otherwise(0L))
      .reduce(_ + _)
    df.withColumn("n_keep", nKeep)
      .withColumn("n_drop", nDrop)
      .withColumn("majority",
        when(col("n_keep") > col("n_drop"), lit("keep"))
          .when(col("n_drop") > col("n_keep"), lit("drop"))
          .otherwise(lit("abstain")))
      .withColumn("margin", abs(col("n_keep") - col("n_drop")))
  }

  /** Long-form vote matrix: (idCol, rule, vote) — the shape per-rule
    * coverage/overlap/conflict statistics aggregate from. */
  def voteMatrix(
      df: DataFrame, idCol: String, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    df.select(col(idCol), explode(array(rules.map { case (name, r) =>
      struct(lit(name).as("rule"), r.cast("long").as("vote"))
    }: _*)).as("__v")).select(col(idCol), col("__v.rule"), col("__v.vote"))
  }

  /** Pairwise Cohen's kappa between labeling rules — chance-corrected
    * agreement, the diagnostic that tells correlated rules (κ → 1,
    * they add no signal) from genuinely independent ones (κ ≈ 0) and
    * from systematic disagreement (κ < 0). Votes are treated as a
    * 3-category nominal outcome (keep/abstain/drop all count — an
    * abstain-abstain pair IS agreement on "no opinion").
    *
    * Exact-rational form: with per-pair totals N, diagonal agreement
    * A, and marginal products P = Σ_c na_c·nb_c,
    * κ = (N·A − P) / (N² − P) — numerator and denominator exact
    * DECIMAL(38,0) integers, one pinned divide. den = 0 (both rules
    * constant with identical marginals, pe = 1) yields null kappa.
    *
    * Scale shape: the per-item self-pairing fans each row out k²/2
    * times (k = #rules, a small constant), then everything collapses
    * to the (pair, vote_a, vote_b) contingency table — ≤ 9·C(k,2)
    * rows; the marginal/diagonal reductions run on that dim, not the
    * data. Output: (rule_a, rule_b, n, agree, num, den, kappa).
    */
  def pairwiseKappa(
      df: DataFrame, idCol: String, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.size >= 2, "kappa needs at least two rules")
    val d38 = "decimal(38,0)"
    val m = voteMatrix(df, idCol, rules)
    val x = m.select(col(idCol), col("rule").as("rule_a"),
      col("vote").as("__va"))
    val y = m.select(col(idCol), col("rule").as("rule_b"),
      col("vote").as("__vb"))
    // joint is the ≤ 9·C(k,2)-row contingency dim feeding THREE
    // reductions (totals, row marginals, col marginals) — materialize
    // it so the data-sized self-pairing runs once, not three times
    val joint = x.join(y, Seq(idCol))
      .where(col("rule_a") < col("rule_b"))
      .groupBy(col("rule_a"), col("rule_b"), col("__va"), col("__vb"))
      .agg(count(lit(1)).as("__n"))
      .materialize()
    val tot = joint.groupBy(col("rule_a"), col("rule_b"))
      .agg(sum(col("__n")).as("n"),
        sum(when(col("__va") === col("__vb"), col("__n")).otherwise(0L))
          .as("agree"))
    val rowm = joint.groupBy(col("rule_a"), col("rule_b"), col("__va"))
      .agg(sum(col("__n")).as("__na"))
    // both marginals descend from `joint`: rename the right side's
    // columns outright so the join condition can't resolve ambiguously
    // (the Mining self-join lesson)
    val colm = joint.groupBy(col("rule_a"), col("rule_b"), col("__vb"))
      .agg(sum(col("__n")).as("__nb"))
      .select(col("rule_a").as("__ra2"), col("rule_b").as("__rb2"),
        col("__vb"), col("__nb"))
    val peTerms = rowm.join(colm,
        col("rule_a") === col("__ra2") && col("rule_b") === col("__rb2") &&
          col("__va") === col("__vb"))
      .groupBy(col("rule_a"), col("rule_b"))
      .agg(sum((col("__na").cast(d38) * col("__nb")).cast(d38)).cast(d38)
        .as("__p"))
    // LEFT join: a pair whose rules share no category has NO pe term —
    // that is P = 0 (kappa = po, fully chance-free), not a dropped row
    tot.join(peTerms, Seq("rule_a", "rule_b"), "left")
      .withColumn("__p", coalesce(col("__p"), lit(0).cast(d38)))
      .withColumn("num",
        (col("n").cast(d38) * col("agree") - col("__p")).cast(d38))
      .withColumn("den",
        (col("n").cast(d38) * col("n") - col("__p")).cast(d38))
      .withColumn("kappa",
        when(col("den") =!= 0,
          col("num").cast("double") / col("den").cast("double")))
      .select(col("rule_a"), col("rule_b"), col("n"), col("agree"),
        col("num"), col("den"), col("kappa"))
  }
}
