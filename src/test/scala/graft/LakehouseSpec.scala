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

  test("keyed upsert replaces matching rows and appends new ones") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft_upsert").resolve("t").toString
    Lakehouse.upsertParquet(spark,
      Seq((2024, 1, "a"), (2024, 2, "b")).toDF("Season", "TeamID", "v"),
      Seq("Season", "TeamID"), path)
    Lakehouse.upsertParquet(spark,
      Seq((2024, 2, "B2"), (2024, 3, "c")).toDF("Season", "TeamID", "v"),
      Seq("Season", "TeamID"), path)
    val out = spark.read.parquet(path).collect()
      .map(r => r.getInt(1) -> r.getString(2)).toMap
    assert(out === Map(1 -> "a", 2 -> "B2", 3 -> "c"))
  }

  test("Season-partitioned writes prune partitions on season filters") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_part").resolve("t").toString
    (2020 to 2023).flatMap(s => (1 to 10).map(i => (s, i)))
      .toDF("Season", "TeamID")
      .write.partitionBy("Season").mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir).filter(col("Season") === 2022)
    assert(q.collect().length === 10) // run THIS queryExecution so its metrics fill
    val scan = q.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .getOrElse(fail("no file scan in plan"))
    assert(scan.partitionFilters.exists(_.toString.contains("2022")),
      s"partition filter missing: ${scan.partitionFilters}")
    // the scan actually selected only the one matching partition directory
    assert(scan.metrics("numFiles").value === 1,
      s"expected 1 file scanned, got ${scan.metrics("numFiles").value}")
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
