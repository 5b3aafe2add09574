package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
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
  }
}
