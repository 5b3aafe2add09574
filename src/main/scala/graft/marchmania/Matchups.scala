package graft.marchmania

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Gold training-table assembly. ≙ reference
  * `jobs/03_build_gold_training_set.py:39-86` +
  * `src/features/basketball_features_plus.py:28-110` +
  * `jobs/feature_helpers.py:20-104`.
  */
object Matchups {

  /** Symmetric labeled matchups (U3): each game emitted winner-first with
    * label 1 and loser-first with label 0, so a downstream model cannot
    * learn column-order bias.
    */
  def buildLabeled(games: DataFrame): DataFrame =
    Relational.symmetricUnion(
      games,
      d => d.select(
        col("Season"), col("GameId"),
        col("WTeamID").cast("int").as("Team1"),
        col("LTeamID").cast("int").as("Team2"),
        lit(1).as("label")),
      d => d.select(
        col("Season"), col("GameId"),
        col("LTeamID").cast("int").as("Team1"),
        col("WTeamID").cast("int").as("Team2"),
        lit(0).as("label")))

  /** Two-sided feature attach (J1-J6) + delta columns (P3).
    * `features` is a per-(Season, TeamID) table; its stat columns land as
    * `T1_<c>` / `T2_<c>`, and every col in `diffCols` also yields
    * `<c>Diff = T1_<c> - T2_<c>`. Left joins: missing feature rows yield
    * nulls (the reference's tolerant optional-feature semantics,
    * `jobs/feature_helpers.py:34-36`). The feature table is per-entity
    * (small vs the matchup fact) — broadcast both attaches so the fact
    * never shuffles.
    */
  def attachFeatures(
      matchups: DataFrame,
      features: DataFrame,
      diffCols: Seq[String]): DataFrame = {
    val attached = Relational.twoSidedAttach(
      matchups,
      features,
      commonKeys = Seq("Season"),
      entityKey = "TeamID",
      side1 = ("Team1", "T1_"),
      side2 = ("Team2", "T2_"))
    diffCols.foldLeft(attached) { (d, c) =>
      d.withColumn(s"${c}Diff", col(s"T1_$c") - col(s"T2_$c"))
    }
  }

  /** Drop rows missing essential features (P5) —
    * ≙ `jobs/03_build_gold_training_set.py:82`. */
  def dropIncomplete(df: DataFrame, essential: Seq[String]): DataFrame =
    df.na.drop(essential)

  /** Parse submission IDs "YYYY_Team1_Team2" into typed key columns (F3)
    * ≙ `jobs/04_train_and_export_submission.py:84-90`. Keeps the ID
    * column for the final export join. */
  def parseSubmissionIds(submission: DataFrame): DataFrame =
    submission.select(
      col("ID"),
      split(col("ID"), "_").getItem(0).cast("int").as("Season"),
      split(col("ID"), "_").getItem(1).cast("int").as("Team1"),
      split(col("ID"), "_").getItem(2).cast("int").as("Team2"))
}
