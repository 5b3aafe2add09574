package graft.marchmania

/** Typed row models for the core domain entities (SURVEY §1.4) — use with
  * `df.as[T]` where compile-time field checks help; the operator library
  * stays DataFrame-based so schemas can extend without recompilation.
  */
case class Game(
    Season: Int, DayNum: Int, GameId: Long,
    WTeamID: Int, WScore: Int, LTeamID: Int, LScore: Int)

case class TeamGame(
    Season: Int, DayNum: Int, GameId: Long, TeamID: Int, OpponentID: Int,
    PointsFor: Int, PointsAgainst: Int, Win: Int, PointDiff: Int)

case class TeamSeasonStat(
    Season: Int, TeamID: Int, Games: Long, Wins: Long, Losses: Long,
    WinRate: Double, AvgPointsFor: Double, AvgPointsAgainst: Double,
    AvgPointDiff: Double)

case class EloRating(Season: Int, TeamID: Int, Elo: Double)

case class SeedInfo(
    Season: Int, TeamID: Int, Seed: String, SeedRegion: String, SeedNum: Int)

case class MasseyConsensus(
    Season: Int, TeamID: Int, MasseyMeanRank: Double,
    MasseyMedianRank: Double, Systems: Long)
