package graft.marchmania

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import scala.collection.mutable
import graft.operators.OrderedFold

/** Season-reset ELO ratings — the reference's single non-relational
  * operator (`src/features/elo.py:33-121`): within each season, fold games
  * in chronological order; every team starts at `initialRating`; after each
  * game `expected_w = 1 / (1 + 10^((r_l - r_w)/400))` and
  * `r_w += k·(1 - expected_w)`, `r_l -= k·(1 - expected_w)` (zero-sum).
  * Emits the final per-team rating per season.
  *
  * Implemented on the secondary-sort OrderedFold (one shuffle on Season,
  * streaming fold, state = one Double per distinct team — bounded by team
  * count, not game count, so a 100 TB season streams through a single
  * executor core with a tiny heap). The reference pays a JVM↔Python Arrow
  * hop per season for the same computation; here it is JVM-native.
  *
  * Ordering is total: (DayNum, GameId) — see SURVEY §7.4 risk 1.
  */
object Elo {
  val OutputSchema: StructType = StructType(Seq(
    StructField("Season", IntegerType, nullable = false),
    StructField("TeamID", IntegerType, nullable = false),
    StructField("Elo", DoubleType, nullable = false)))

  def perSeason(
      games: DataFrame,
      kFactor: Double = 20.0,
      initialRating: Double = 1500.0): DataFrame = {
    val in = games.select(
      col("Season").cast("int"),
      col("DayNum").cast("int"),
      col("GameId"),
      col("WTeamID").cast("int"),
      col("LTeamID").cast("int"))
    val wIdx = 3; val lIdx = 4
    OrderedFold.foldGroups[mutable.LinkedHashMap[Int, Double]](
      in,
      keyCols = Seq("Season"),
      orderCols = Seq(col("DayNum"), col("GameId")),
      outSchema = OutputSchema)(
      init = _ => mutable.LinkedHashMap.empty[Int, Double],
      step = (ratings, r) => {
        val w = r.getInt(wIdx); val l = r.getInt(lIdx)
        val rw = ratings.getOrElse(w, initialRating)
        val rl = ratings.getOrElse(l, initialRating)
        val expectedW = 1.0 / (1.0 + math.pow(10.0, (rl - rw) / 400.0))
        val delta = kFactor * (1.0 - expectedW)
        ratings(w) = rw + delta
        ratings(l) = rl - delta
        ratings
      },
      emit = (key, ratings) => {
        val season = key.getInt(0)
        ratings.toSeq.sortBy(_._1).iterator.map { case (team, elo) =>
          new GenericInternalRow(Array[Any](season, team, elo))
        }
      })
  }
}
