package graft.text

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
}
