package graft.marchmania

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Long-format game table: each game emitted once per participating team
  * ("winners view" ∪ "losers view"), the input shape for rolling windows,
  * team-season stats and SOS. ≙ reference `src/features/rolling.py:20-55`
  * (U1) and `src/features/basketball_features.py:43-64` (U2).
  *
  * Expected input columns (Kaggle compact-results schema, FIXTURES.md §A):
  * Season, DayNum, GameId (any unique tie-break id), WTeamID, WScore,
  * LTeamID, LScore. Narrow op — no shuffle.
  */
object LongGames {
  def build(games: DataFrame): DataFrame =
    Relational.symmetricUnion(
      games,
      d => d.select(
        col("Season"), col("DayNum"), col("GameId"),
        col("WTeamID").cast("int").as("TeamID"),
        col("LTeamID").cast("int").as("OpponentID"),
        col("WScore").cast("int").as("PointsFor"),
        col("LScore").cast("int").as("PointsAgainst"),
        lit(1).as("Win")),
      d => d.select(
        col("Season"), col("DayNum"), col("GameId"),
        col("LTeamID").cast("int").as("TeamID"),
        col("WTeamID").cast("int").as("OpponentID"),
        col("LScore").cast("int").as("PointsFor"),
        col("WScore").cast("int").as("PointsAgainst"),
        lit(0).as("Win")))
      .withColumn("PointDiff", col("PointsFor") - col("PointsAgainst"))
}

/** Per-(Season, TeamID) aggregate stats. ≙ reference
  * `src/features/basketball_features.py:63-76` (A1): Games, Wins, Losses,
  * WinRate, AvgPointsFor, AvgPointsAgainst, AvgPointDiff.
  * One shuffle (partial hash agg map-side first). All averages are over
  * int-valued points, so sums are exact and the single final division is
  * bit-deterministic at any parallelism.
  */
object TeamSeasonStats {
  def build(games: DataFrame): DataFrame =
    LongGames.build(games)
      .groupBy(col("Season"), col("TeamID"))
      .agg(
        count(lit(1)).as("Games"),
        sum(col("Win")).as("Wins"),
        (count(lit(1)) - sum(col("Win"))).as("Losses"),
        (sum(col("Win")) / count(lit(1))).as("WinRate"),
        avg(col("PointsFor")).as("AvgPointsFor"),
        avg(col("PointsAgainst")).as("AvgPointsAgainst"),
        avg(col("PointDiff")).as("AvgPointDiff"))
}
