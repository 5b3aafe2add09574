package graft.marchmania

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Tier-3 box-score features from detailed results (the 13 per-side stat
  * columns `FGM FGA FGM3 FGA3 FTM FTA OR DR Ast TO Stl Blk PF`,
  * FIXTURES.md §A; listed as future features in the reference's
  * FEATURES_GUIDE). Two-sided union to long format, then exact-sum
  * aggregates; every rate is a single division of exact integer sums, so
  * results are partition-independent.
  */
object DetailedStats {

  private val Stats = Seq(
    "FGM", "FGA", "FGM3", "FGA3", "FTM", "FTA",
    "OR", "DR", "Ast", "TO", "Stl", "Blk", "PF")

  /** Long format: one row per team-game with its own and opponent's box
    * stats (`<stat>` / `Opp<stat>`). */
  def longBoxScores(detailed: DataFrame): DataFrame =
    Relational.symmetricUnion(
      detailed,
      d => d.select(
        Seq(col("Season").cast("int").as("Season"),
          col("DayNum").cast("int").as("DayNum"),
          col("WTeamID").cast("int").as("TeamID"),
          lit(1).as("Win")) ++
          Stats.map(s => col(s"W$s").cast("int").as(s)) ++
          Stats.map(s => col(s"L$s").cast("int").as(s"Opp$s")): _*),
      d => d.select(
        Seq(col("Season").cast("int").as("Season"),
          col("DayNum").cast("int").as("DayNum"),
          col("LTeamID").cast("int").as("TeamID"),
          lit(0).as("Win")) ++
          Stats.map(s => col(s"L$s").cast("int").as(s)) ++
          Stats.map(s => col(s"W$s").cast("int").as(s"Opp$s")): _*))

  /** Per-(Season, TeamID) efficiency profile. */
  def build(detailed: DataFrame): DataFrame = {
    val long = longBoxScores(detailed)
    long.groupBy(col("Season"), col("TeamID"))
      .agg(
        count(lit(1)).as("Games"),
        (sum(col("FGM")) / sum(col("FGA"))).as("FgPct"),
        (sum(col("FGM3")) / sum(col("FGA3"))).as("Fg3Pct"),
        (sum(col("FTM")) / sum(col("FTA"))).as("FtPct"),
        (sum(col("Ast")) / sum(col("TO"))).as("AstToRatio"),
        ((sum(col("OR")) + sum(col("DR"))) / count(lit(1))).as("ReboundsPerGame"),
        (sum(col("OR")) / (sum(col("OR")) + sum(col("OppDR")))).as("OffRebRate"),
        (sum(col("Stl")) / count(lit(1))).as("StealsPerGame"),
        (sum(col("Blk")) / count(lit(1))).as("BlocksPerGame"),
        (sum(col("PF")) / count(lit(1))).as("FoulsPerGame"),
        // possessions estimate: FGA − OR + TO + 0.475·FTA (public formula)
        ((sum(col("FGA")) - sum(col("OR")) + sum(col("TO")))
          + lit(0.475) * sum(col("FTA"))).as("PossessionsEst"))
  }
}
