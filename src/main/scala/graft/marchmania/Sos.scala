package graft.marchmania

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Strength of schedule. ≙ reference `src/features/sos.py:19-60` (J7+A3):
  * join each long-format game to the OPPONENT's season stats, then average
  * the opponent stat per (Season, TeamID).
  *
  * `oppCols` maps output column -> opponent stat column in `teamStats`.
  * Double-valued stats are accumulated through an exact decimal(18,9) sum
  * so the mean is independent of partitioning/merge order (plain double
  * sums are not associative). Join side `teamStats` is per-team-per-season
  * (small relative to games) — broadcast.
  */
object Sos {
  def build(
      longGames: DataFrame,
      teamStats: DataFrame,
      oppCols: Seq[(String, String)]): DataFrame = {
    val statCols = oppCols.map(_._2).distinct
    val opp = teamStats.select(
      (Seq(col("Season"), col("TeamID").as("OpponentID")) ++
        statCols.map(c => col(c).as(s"Opp_$c"))): _*)
    val joined = longGames
      .select("Season", "TeamID", "OpponentID")
      .join(broadcast(opp), Seq("Season", "OpponentID"), "left")
    val aggs = oppCols.map { case (out, src) =>
      (sum(col(s"Opp_$src").cast(DecimalType(18, 9))).cast("double") /
        count(col(s"Opp_$src"))).as(out)
    }
    joined
      .groupBy(col("Season"), col("TeamID"))
      .agg(aggs.head, aggs.tail: _*)
  }
}
