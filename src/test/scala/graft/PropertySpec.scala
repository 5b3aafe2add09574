package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.marchmania.{Elo, LongGames, TeamSeasonStats}

/** ScalaCheck property tests over arbitrary game sets (SURVEY §5):
  * structural invariants that must hold for ANY input, not just fixtures.
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val genGames: Gen[List[(Int, Int, Long, Int, Int, Int, Int)]] =
    Gen.choose(0, 60).flatMap { n =>
      Gen.sequence[List[(Int, Int, Long, Int, Int, Int, Int)], (Int, Int, Long, Int, Int, Int, Int)](
        (0 until n).map { i =>
          for {
            season <- Gen.choose(2022, 2024)
            day <- Gen.choose(1, 100)
            w <- Gen.choose(0, 9)
            l <- Gen.choose(10, 19) // disjoint ranges: W != L
            ws <- Gen.choose(51, 100)
            ls <- Gen.choose(0, 50)
          } yield (season, day, i.toLong, w, ws, l, ls)
        }.toList)
    }

  private def checkProp(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: long table has exactly 2 rows per game, stats are consistent") {
    checkProp(Prop.forAll(genGames) { games =>
      val df = games.toDF("Season", "DayNum", "GameId", "WTeamID", "WScore", "LTeamID", "LScore")
      val long = LongGames.build(df)
      val stats = TeamSeasonStats.build(df)
      val badStats = stats.filter(
        $"Wins" + $"Losses" =!= $"Games" || $"WinRate" < 0 || $"WinRate" > 1).count()
      long.count() == 2L * games.size &&
        badStats == 0 &&
        stats.agg(coalesce(sum($"Games"), lit(0L))).head.getLong(0) == 2L * games.size
    })
  }

  test("property: ELO is zero-sum per season for arbitrary game sets") {
    checkProp(Prop.forAll(genGames) { games =>
      val df = games.toDF("Season", "DayNum", "GameId", "WTeamID", "WScore", "LTeamID", "LScore")
      Elo.perSeason(df)
        .groupBy($"Season")
        .agg(sum($"Elo").as("total"), count(lit(1)).as("n"))
        .collect()
        .forall(r => math.abs(r.getAs[Double]("total") - 1500.0 * r.getAs[Long]("n")) < 1e-6)
    })
  }
}
