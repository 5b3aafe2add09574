package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._
import graft.jobs.PipelineRunner

class PipelineRunnerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("end-to-end: csv -> bronze -> silver -> gold -> backtest -> submission") {
    val in = Files.createTempDirectory("graft_pipe_in")
    val rnd = new scala.util.Random(11)
    val rows = for (season <- 2021 to 2023; day <- 1 to 40) yield {
      val a = 1101 + rnd.nextInt(6); val b = 1110 + rnd.nextInt(6)
      val (ws, ls) = (60 + rnd.nextInt(30), 40 + rnd.nextInt(19))
      s"$season,$day,$a,$ws,$b,$ls,H,0"
    }
    Files.writeString(in.resolve("MRegularSeasonCompactResults.csv"),
      "Season,DayNum,WTeamID,WScore,LTeamID,LScore,WLoc,NumOT\n" + rows.mkString("\n") + "\n")
    val lake = Files.createTempDirectory("graft_pipe_lake")
    val sub = Files.createTempDirectory("graft_pipe_out").resolve("submission.csv")

    val result = PipelineRunner.run(
      spark, in.toString, lake.toString, exportCsv = Some(sub.toString))

    assert(result.seasonsBuilt === 3)
    assert(result.goldRows > 0)
    assert(result.backtest.map(_.season) === Seq(2022, 2023))
    result.backtest.foreach(m => assert(!m.auc.isNaN))
    val lines = Files.readAllLines(sub)
    assert(lines.get(0) === "ID,Pred")
    assert(lines.size.toLong === result.goldRows + 1)
    // silver landed partitioned by Season (partition pruning layout)
    assert(Files.exists(lake.resolve("silver/M/team_season_stats/Season=2021")))
    assert(Files.exists(lake.resolve("gold/M/training_matchups/Season=2023")))

    // S7: HPO tune -> JSON export -> reload -> ensemble export (jobs 11+12)
    val gold = spark.read.parquet(lake.resolve("gold/M/training_matchups").toString)
    val hpoPath = lake.resolve("artifacts/hpo_best_params.json").toString
    val featureCols = Seq("WinRateDiff", "AvgPointDiffDiff", "EloDiff")
    val tuned = PipelineRunner.hpoBacktest(
      gold, featureCols, "M", hpoPath,
      lrRegParams = Seq(0.01, 0.1), lrElasticNets = Seq(0.0), lrMaxIter = 10,
      gbtMaxDepths = Seq(2), gbtMaxIters = Seq(5), gbtSubsampling = Seq(0.9))
    assert(Files.exists(java.nio.file.Paths.get(hpoPath)))
    assert(!tuned.logreg.auc.isNaN && !tuned.gbt.auc.isNaN)
    assert(Seq(0.01, 0.1).contains(tuned.logreg.params("regParam")))

    // round-trip: the reloaded file parses back to the written values
    val reloaded = graft.ml.HpoParams.read(hpoPath).get
    assert(reloaded.valSeason === tuned.valSeason)
    assert(reloaded.featureCols === featureCols)
    assert(reloaded.logreg.params === tuned.logreg.params)
    assert(reloaded.gbt.params === tuned.gbt.params)
    assert(reloaded.gbt.auc === tuned.gbt.auc)

    // ensemble export fits with the loaded params and blends LR+GBT
    val sub2 = Files.createTempDirectory("graft_pipe_out2").resolve("ensemble.csv")
    val result2 = PipelineRunner.run(
      spark, in.toString, lake.toString,
      exportCsv = Some(sub2.toString), hpoParamsPath = Some(hpoPath))
    val lines2 = Files.readAllLines(sub2)
    assert(lines2.get(0) === "ID,Pred")
    assert(lines2.size.toLong === result2.goldRows + 1)
    val preds = (1 until lines2.size).map(i => lines2.get(i).split(",")(1).toDouble)
    assert(preds.forall(p => p >= 0.0 && p <= 1.0))
  }

  test("typed pipeline config parses the reference yml shape and drives a run") {
    val yml = """
      |# Pipeline configuration (edit for experiments)
      |competition:
      |  league: "w"  # lowercased on purpose
      |  name: "march-machine-learning-mania-2026"
      |spark:
      |  shuffle_partitions: 8
      |  adaptive_enabled: true
      |elo:
      |  initial_rating: 1400.0
      |  k_factor: 32.0
      |rolling:
      |  window_last_n_games: 4
      |modeling:
      |  blend_alpha_gbt: 0.5
      |  gbt:
      |    max_iter: 200
      |    max_depth: 5
      |  logreg:
      |    max_iter: 80
      |    reg_param: 0.05
      |backtest:
      |  min_train_season: 2021
      |  max_val_season: 2022
      |""".stripMargin
    val cfg = graft.jobs.PipelineConfig.fromText(yml)
    assert(cfg.league === "W")
    assert(cfg.shufflePartitions === 8)
    assert(cfg.eloInitialRating === 1400.0)
    assert(cfg.eloKFactor === 32.0)
    assert(cfg.rollingN === 4)
    assert(cfg.blendAlphaGbt === 0.5)
    assert(cfg.gbtMaxIter === 200)
    assert(cfg.minTrainSeason === 2021)
    assert(cfg.maxValSeason === 2022)
    // unspecified keys keep defaults
    assert(cfg.gbtSubsamplingRate === 0.8)
    assert(cfg.lrElasticNet === 0.0)

    // config-driven run: W league fixture, backtest bounded to 2022 only
    val in = Files.createTempDirectory("graft_cfg_in")
    val rnd = new scala.util.Random(29)
    val rows = for (season <- 2021 to 2023; day <- 1 to 25) yield {
      val a = 3101 + rnd.nextInt(5); val b = 3110 + rnd.nextInt(5)
      s"$season,$day,$a,${60 + rnd.nextInt(20)},$b,${40 + rnd.nextInt(19)},H,0"
    }
    Files.writeString(in.resolve("WRegularSeasonCompactResults.csv"),
      "Season,DayNum,WTeamID,WScore,LTeamID,LScore,WLoc,NumOT\n" + rows.mkString("\n") + "\n")
    val lake = Files.createTempDirectory("graft_cfg_lake")
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      val result = graft.jobs.PipelineRunner.run(
        spark, in.toString, lake.toString, cfg, exportCsv = None, hpoParamsPath = None)
      assert(result.seasonsBuilt === 3)
      // max_val_season=2022 excludes the 2023 fold
      assert(result.backtest.map(_.season) === Seq(2022))
      assert(Files.exists(lake.resolve("silver/W/elo_ratings/Season=2021")))
      // the config's execution settings apply only for the run's duration:
      // the caller's session conf is restored afterwards
      assert(spark.conf.get("spark.sql.shuffle.partitions") === before)
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("manifest commit protocol: pipeline lands silver/gold as committed generations") {
    val in = Files.createTempDirectory("graft_mc_in")
    val rnd = new scala.util.Random(31)
    val rows = for (season <- 2022 to 2023; day <- 1 to 30) yield {
      val a = 1101 + rnd.nextInt(5); val b = 1110 + rnd.nextInt(5)
      s"$season,$day,$a,${60 + rnd.nextInt(20)},$b,${40 + rnd.nextInt(19)},H,0"
    }
    Files.writeString(in.resolve("MRegularSeasonCompactResults.csv"),
      "Season,DayNum,WTeamID,WScore,LTeamID,LScore,WLoc,NumOT\n" + rows.mkString("\n") + "\n")
    val lake = Files.createTempDirectory("graft_mc_lake")
    val cfg = graft.jobs.PipelineConfig(commitProtocol = "manifest")
    val result = PipelineRunner.run(
      spark, in.toString, lake.toString, cfg, exportCsv = None, hpoParamsPath = None)
    assert(result.goldRows > 0)
    // silver/gold are manifest datasets: a committed generation exists and
    // reads back Season-partitioned through the manifest
    val gold = lake.resolve("gold/M/training_matchups")
    assert(Files.list(gold).iterator().asScala
      .exists(_.getFileName.toString.startsWith("_manifest-")))
    val read = graft.sources.ManifestCommit.read(spark, gold.toString)
    assert(read.count() === result.goldRows)
    assert(read.columns.contains("Season"))
  }

  test("missing HPO params file falls back to reference defaults") {
    assert(graft.ml.HpoParams.read("/nonexistent/hpo.json").isEmpty)
    val lr = graft.ml.HpoParams.lrFrom(Map.empty, Seq("f1"))
    val lrStage = lr.getStages(1).asInstanceOf[org.apache.spark.ml.classification.LogisticRegression]
    assert(lrStage.getMaxIter === 80)
    assert(lrStage.getRegParam === 0.05)
    val gbt = graft.ml.HpoParams.gbtFrom(Map.empty, Seq("f1"))
    val gbtStage = gbt.getStages(1).asInstanceOf[org.apache.spark.ml.classification.GBTClassifier]
    assert(gbtStage.getMaxIter === 120)
    assert(gbtStage.getSubsamplingRate === 0.8)
  }
}
