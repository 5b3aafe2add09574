package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.marchmania._

class MarchManiaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** (Season, DayNum, GameId, WTeamID, WScore, LTeamID, LScore) */
  private def gamesDf(rows: (Int, Int, Long, Int, Int, Int, Int)*): DataFrame =
    rows.toSeq.toDF("Season", "DayNum", "GameId", "WTeamID", "WScore", "LTeamID", "LScore")

  private val tiny = gamesDf(
    (2024, 1, 1L, 101, 70, 102, 60),
    (2024, 2, 2L, 101, 80, 102, 75),
    (2024, 3, 3L, 103, 66, 101, 65))

  test("LongGames doubles every game, one row per perspective") {
    val long = LongGames.build(tiny)
    assert(long.count() === 6)
    val a = long.filter($"TeamID" === 101 && $"GameId" === 1L).collect().head
    assert(a.getAs[Int]("PointsFor") === 70)
    assert(a.getAs[Int]("PointsAgainst") === 60)
    assert(a.getAs[Int]("Win") === 1)
    assert(a.getAs[Int]("PointDiff") === 10)
  }

  test("TeamSeasonStats: Wins + Losses = Games, WinRate bounded, exact values") {
    val stats = TeamSeasonStats.build(tiny)
    val bad = stats.filter(
      $"Wins" + $"Losses" =!= $"Games" || $"WinRate" < 0 || $"WinRate" > 1)
    assert(bad.count() === 0)
    val t101 = stats.filter($"TeamID" === 101).collect().head
    assert(t101.getAs[Long]("Games") === 3)
    assert(t101.getAs[Long]("Wins") === 2)
    assert(t101.getAs[Double]("WinRate") === 2.0 / 3.0)
    assert(t101.getAs[Double]("AvgPointsFor") === (70 + 80 + 65) / 3.0)
  }

  test("Rolling excludes the current row and is null on the season's first game") {
    val roll = Rolling.features(LongGames.build(tiny), n = 10)
      .filter($"TeamID" === 101).orderBy($"DayNum").collect()
    assert(roll(0).isNullAt(roll(0).fieldIndex("RollWinRate"))) // empty frame
    assert(roll(1).getAs[Double]("RollWinRate") === 1.0)        // only game 1
    assert(roll(1).getAs[Double]("RollAvgPointDiff") === 10.0)
    assert(roll(2).getAs[Double]("RollWinRate") === 1.0)        // games 1,2
    assert(roll(2).getAs[Double]("RollAvgPointDiff") === 7.5)
  }

  test("Rolling.lastPerSeason keeps exactly one row per team-season") {
    val last = Rolling.lastPerSeason(Rolling.features(LongGames.build(tiny), n = 10))
    assert(last.count() === 3)
    val t101 = last.filter($"TeamID" === 101).collect().head
    assert(t101.getAs[Int]("DayNum") === 3)
  }

  test("Elo matches the hand-computed 3-game fixture bit-for-bit") {
    val elo = Elo.perSeason(tiny).collect()
      .map(r => r.getAs[Int]("TeamID") -> r.getAs[Double]("Elo")).toMap
    assert(elo(101) === 1508.8664744330495)
    assert(elo(102) === 1480.5750112778453)
    assert(elo(103) === 1510.5585142891052)
  }

  test("Elo MOV+home variant matches an independent scalar replay bit-for-bit") {
    // HomeCode: game 1 winner away, game 2 winner home, game 3 neutral.
    val withLoc = tiny.withColumn("HomeCode", (col("GameId") % 3).cast("int"))
    val got = Elo.perSeasonMovHome(withLoc, homeAdvantage = 100.0).collect()
      .map(r => r.getAs[Int]("TeamID") -> r.getAs[Double]("Elo")).toMap

    // Independent replay: plain var-based fold over the same ordered games.
    val ratings = scala.collection.mutable.Map[Int, Double]()
    def r(t: Int) = ratings.getOrElse(t, 1500.0)
    for ((w, l, ws, ls, code) <- Seq(
        (101, 102, 70, 60, 1), (101, 102, 80, 75, 2), (103, 101, 66, 65, 0))) {
      val rwEff = r(w) + (if (code == 0) 100.0 else 0.0)
      val rlEff = r(l) + (if (code == 1) 100.0 else 0.0)
      val expectedW = 1.0 / (1.0 + math.pow(10.0, (rlEff - rwEff) / 400.0))
      val delta = 20.0 * math.log(1.0 + (ws - ls).toDouble) * (1.0 - expectedW)
      val (rw0, rl0) = (r(w), r(l))
      ratings(w) = rw0 + delta
      ratings(l) = rl0 - delta
    }
    assert(got === ratings.toMap)
    // Blowout (game 1, margin 10) moved ratings more than the squeaker
    // (game 2, margin 5) would have from the same start; home term shifted
    // expectations: winner-away game 1 yields a larger delta than neutral.
    assert(got(101) !== 1500.0)
  }

  test("Elo is zero-sum (total rating conserved at 1500 per team per season)") {
    val games = gamesDf((1 to 200).map { i =>
      (2000 + i % 3, i, i.toLong, i % 7, 60 + i % 20, 10 + i % 5, 40 + i % 10)
    }: _*)
    val sums = Elo.perSeason(games)
      .groupBy($"Season")
      .agg(sum($"Elo").as("total"), count(lit(1)).as("n"))
      .collect()
    sums.foreach { r =>
      assert(math.abs(r.getAs[Double]("total") - 1500.0 * r.getAs[Long]("n")) < 1e-6)
    }
  }

  test("Elo resets across seasons (independent folds per season)") {
    val twoSeasons = gamesDf(
      (2023, 1, 1L, 1, 70, 2, 60),
      (2024, 1, 2L, 1, 70, 2, 60))
    val byYear = Elo.perSeason(twoSeasons).collect()
      .groupBy(_.getAs[Int]("Season"))
    assert(byYear(2023).map(_.getAs[Double]("Elo")).sorted.toSeq === Seq(1490.0, 1510.0))
    assert(byYear(2024).map(_.getAs[Double]("Elo")).sorted.toSeq === Seq(1490.0, 1510.0))
  }

  test("Seeds parses region and number, dropping play-in suffix") {
    val parsed = Seeds.parse(Seq(
      (2024, 1101, "W01"), (2024, 1102, "X16a"), (2024, 1103, "Z09"))
      .toDF("Season", "TeamID", "Seed"))
      .collect().map(r => r.getAs[String]("Seed") ->
        (r.getAs[String]("SeedRegion"), r.getAs[Int]("SeedNum"))).toMap
    assert(parsed("W01") === ("W", 1))
    assert(parsed("X16a") === ("X", 16))
    assert(parsed("Z09") === ("Z", 9))
  }

  test("Massey keeps only the latest ranking per system before averaging") {
    val ordinals = Seq(
      (2024, 1101, "SYS_A", 10, 5),
      (2024, 1101, "SYS_A", 50, 1),  // later ranking wins
      (2024, 1101, "SYS_B", 50, 3))
      .toDF("Season", "TeamID", "SystemName", "RankingDayNum", "OrdinalRank")
    val c = Massey.consensus(ordinals).collect().head
    assert(c.getAs[Double]("MasseyMeanRank") === 2.0)   // (1+3)/2
    assert(c.getAs[Double]("MasseyMedianRank") === 2.0)
    assert(c.getAs[Long]("Systems") === 2)
  }

  test("Sos averages opponent stats over the games actually played") {
    val long = LongGames.build(tiny)
    val stats = TeamSeasonStats.build(tiny)
    val sos = Sos.build(long, stats, Seq("SosOppWinRate" -> "WinRate"))
      .collect().map(r => r.getAs[Int]("TeamID") -> r.getAs[Double]("SosOppWinRate")).toMap
    // opponent stats pass through a decimal(18,9) quantization -> 1e-9 grid
    // 101 played 102, 102, 103 -> opponents' win rates (0, 0, 1) -> 1/3
    assert(math.abs(sos(101) - 1.0 / 3.0) < 1e-8)
    // 102 played 101 twice -> 2/3
    assert(math.abs(sos(102) - 2.0 / 3.0) < 1e-8)
  }

  test("parseSubmissionIds splits YYYY_T1_T2 into typed keys") {
    val parsed = Matchups.parseSubmissionIds(
      Seq(("2026_1101_1234", 0.5)).toDF("ID", "Pred")).collect().head
    assert(parsed.getAs[Int]("Season") === 2026)
    assert(parsed.getAs[Int]("Team1") === 1101)
    assert(parsed.getAs[Int]("Team2") === 1234)
  }

  test("Matchups are symmetric with negated diffs on the flipped row") {
    val stats = TeamSeasonStats.build(tiny).select($"Season", $"TeamID", $"WinRate")
    val m = Matchups.attachFeatures(
      Matchups.buildLabeled(tiny), stats, diffCols = Seq("WinRate"))
    assert(m.count() === 6)
    val g1 = m.filter($"GameId" === 1L).collect()
      .map(r => r.getAs[Int]("label") -> r.getAs[Double]("WinRateDiff")).toMap
    assert(g1(1) === -g1(0))
  }
}
