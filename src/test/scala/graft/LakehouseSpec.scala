package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{DatasetRegistry, LakePaths, Lakehouse}

class LakehouseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("registry routes known files and falls through to misc") {
    assert(DatasetRegistry.route("MTeams.csv").lakeSubpath === "M/teams")
    assert(DatasetRegistry.route("Mystery.csv").lakeSubpath === "misc/Mystery")
  }

  test("bronze ingest: csv -> trimmed strings -> parquet round-trip") {
    val in = Files.createTempDirectory("graft_in")
    Files.writeString(in.resolve("MTeams.csv"),
      "TeamID,TeamName\n1101,  Duke  \n1102,Kansas\n")
    Files.writeString(in.resolve("Mystery.csv"), "a,b\n1,x\n")
    val lakeDir = Files.createTempDirectory("graft_lake")
    val landed = Lakehouse.ingestBronze(spark, in.toString, LakePaths(lakeDir.toString))
    assert(landed.size === 2)
    val teams = spark.read.parquet(s"$lakeDir/bronze/M/teams")
    assert(teams.filter(col("TeamID") === 1101).head.getAs[String]("TeamName") === "Duke")
    assert(spark.read.parquet(s"$lakeDir/bronze/misc/Mystery").count() === 1)
  }

  test("single-file csv export produces exactly one readable artifact") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_csv").resolve("sub.csv")
    Lakehouse.exportSingleCsv(
      Seq(("2026_1101_1102", 0.5), ("2026_1101_1103", 0.7)).toDF("ID", "Pred"), out.toString)
    val lines = Files.readAllLines(out)
    assert(lines.get(0) === "ID,Pred")
    assert(lines.size === 3)
  }
}
