package graft.jobs

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.marchmania._
import graft.ml.{Backtest, Modeling}
import graft.sources.{LakePaths, Lakehouse}

/** In-process pipeline ≙ reference `jobs/01…12` + `run_pipeline.py`:
  * one SparkSession, sequential fail-fast stages, Bronze → Silver → Gold
  * → backtest → submission export. Unlike the reference (a spark-submit
  * subprocess per job), stages share the session so nothing re-pays JVM
  * startup, and silver/gold land partitioned by Season for downstream
  * partition pruning on season-split reads.
  */
object PipelineRunner {

  final case class Result(
      seasonsBuilt: Long,
      goldRows: Long,
      backtest: Seq[Backtest.FoldMetrics],
      submissionPath: Option[String])

  /** @param inputDir  directory of Kaggle-schema CSVs (compact results,
    *                  seeds, …) routed by the dataset registry
    * @param lakeRoot  lake root directory
    * @param league    M or W
    */
  def run(
      spark: SparkSession,
      inputDir: String,
      lakeRoot: String,
      league: String = "M",
      rollingN: Int = 10,
      exportCsv: Option[String] = None): Result = {
    val lake = LakePaths(lakeRoot)

    // 01: bronze ingest (csv -> trimmed -> parquet)
    Lakehouse.ingestBronze(spark, inputDir, lake)

    // games with a stable GameId for deterministic fold/window tie-breaks
    val games = spark.read.parquet(lake.bronze(s"$league/regular_compact"))
    val gamesKeyed = games.select(
      col("Season").cast("int").as("Season"),
      col("DayNum").cast("int").as("DayNum"),
      // content-derived id: deterministic ACROSS runs, unlike mono_id
      abs(xxhash64(col("Season"), col("DayNum"), col("WTeamID"), col("LTeamID"),
        col("WScore"), col("LScore"))).as("GameId"),
      col("WTeamID"), col("LTeamID"), col("WScore"), col("LScore"))

    def writeSilver(df: DataFrame, name: String): DataFrame = {
      df.write.mode(SaveMode.Overwrite)
        .partitionBy("Season")
        .parquet(lake.silver(league, name))
      spark.read.parquet(lake.silver(league, name))
    }

    // 02: team-season stats  05: elo  06: rolling snapshot
    val stats = writeSilver(TeamSeasonStats.build(gamesKeyed), "team_season_stats")
    val elo = writeSilver(Elo.perSeason(gamesKeyed), "elo_ratings")
    val rolling = writeSilver(
      Rolling.lastPerSeason(Rolling.features(LongGames.build(gamesKeyed), rollingN)),
      "rolling_last_per_season")

    // 03: gold training matchups (two-sided attach + diffs + dropna)
    val features = stats.select("Season", "TeamID", "WinRate", "AvgPointDiff")
      .join(elo, Seq("Season", "TeamID"), "left")
      .join(rolling.select(col("Season"), col("TeamID"), col("RollWinRate")),
        Seq("Season", "TeamID"), "left")
    val gold = Matchups.dropIncomplete(
      Matchups.attachFeatures(
        Matchups.buildLabeled(gamesKeyed), features,
        diffCols = Seq("WinRate", "AvgPointDiff", "Elo")),
      essential = Seq("WinRateDiff", "AvgPointDiffDiff", "EloDiff"))
    gold.write.mode(SaveMode.Overwrite).partitionBy("Season")
      .parquet(lake.gold(league, "training_matchups"))
    val goldRead = spark.read.parquet(lake.gold(league, "training_matchups"))

    // 07: rolling backtest
    val featureCols = Seq("WinRateDiff", "AvgPointDiffDiff", "EloDiff")
    val metrics = Backtest.rollingSeasons(
      Modeling.fillMissing(goldRead, featureCols), featureCols, maxIter = 15)

    // 04/12: final fit + submission export
    val path = exportCsv.map { out =>
      val full = Modeling.fillMissing(goldRead, featureCols)
      val model = Modeling.lrPipeline(featureCols, maxIter = 15).fit(full)
      val scored = model.transform(full).select(
        concat_ws("_", col("Season"), col("Team1"), col("Team2")).as("ID"),
        Modeling.probOf().as("Pred"))
      Lakehouse.exportSingleCsv(scored, out).toString
    }

    Result(
      seasonsBuilt = stats.select("Season").distinct().count(),
      goldRows = goldRead.count(),
      backtest = metrics,
      submissionPath = path)
  }
}
