package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import scala.jdk.CollectionConverters._

/** Bronze/Silver/Gold lakehouse path scheme ≙ reference
  * `src/common/paths.py:23-55`. Root is any filesystem/object-store URI.
  */
final case class LakePaths(root: String) {
  def bronze(sub: String): String = s"$root/bronze/$sub"
  def silver(league: String, dataset: String): String = s"$root/silver/$league/$dataset"
  def gold(league: String, dataset: String): String = s"$root/gold/$league/$dataset"
}

/** Dataset registry ≙ reference `src/common/datasets.py:20-96`: maps known
  * input filenames to lake subpaths, with kind/league tags; unknown files
  * route to misc/ instead of failing.
  */
final case class DatasetSpec(
    datasetName: String, lakeSubpath: String, kind: String, league: String)

object DatasetRegistry {
  val Known: Map[String, DatasetSpec] = {
    def spec(file: String, name: String, kind: String, league: String) =
      file -> DatasetSpec(name, s"$league/$name", kind, league)
    Map(
      spec("MRegularSeasonCompactResults.csv", "regular_compact", "regular_season", "M"),
      spec("WRegularSeasonCompactResults.csv", "regular_compact", "regular_season", "W"),
      spec("MNCAATourneyCompactResults.csv", "tourney_compact", "tournament", "M"),
      spec("WNCAATourneyCompactResults.csv", "tourney_compact", "tournament", "W"),
      spec("MNCAATourneySeeds.csv", "tourney_seeds", "tournament", "M"),
      spec("WNCAATourneySeeds.csv", "tourney_seeds", "tournament", "W"),
      spec("MMasseyOrdinals.csv", "massey_ordinals", "rankings", "M"),
      spec("MTeams.csv", "teams", "reference", "M"),
      spec("WTeams.csv", "teams", "reference", "W"),
      spec("MSeasons.csv", "seasons", "reference", "M"),
      spec("WSeasons.csv", "seasons", "reference", "W"),
      spec("SampleSubmissionStage1.csv", "submission_stage1", "submission", "U"),
      spec("SampleSubmissionStage2.csv", "submission_stage2", "submission", "U"))
  }

  /** Unknown files fall through to misc/ (never fail ingest). */
  def route(fileName: String): DatasetSpec =
    Known.getOrElse(fileName,
      DatasetSpec(fileName.stripSuffix(".csv"), s"misc/${fileName.stripSuffix(".csv")}", "misc", "U"))
}

/** Scan/sink operators S1-S8 (SURVEY §2.1). */
object Lakehouse {

  /** S1 + F1: header CSV read with schema inference and every string
    * column trimmed ≙ `jobs/01_ingest_bronze.py:47-57`. */
  def readCsvTrimmed(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read
      .option("header", "true").option("inferSchema", "true")
      .csv(path)
    raw.schema.fields.filter(_.dataType == StringType).foldLeft(raw) {
      (df, f) => df.withColumn(f.name, trim(col(f.name)))
    }
  }

  /** S8 + S4: discover `*.csv` under `inputDir`, route each through the
    * registry, land as Bronze parquet ≙ `jobs/01_ingest_bronze.py:38-65`.
    * Returns (file, landedPath) pairs.
    */
  def ingestBronze(
      spark: SparkSession,
      inputDir: String,
      lake: LakePaths): Seq[(String, String)] = {
    val files = Files.list(Paths.get(inputDir)).iterator().asScala
      .filter(_.toString.endsWith(".csv")).toSeq.sortBy(_.toString)
    files.map { f =>
      val spec = DatasetRegistry.route(f.getFileName.toString)
      val out = lake.bronze(spec.lakeSubpath)
      readCsvTrimmed(spark, f.toString)
        .write.mode(SaveMode.Overwrite).parquet(out)
      f.toString -> out
    }
  }

  /** S4: standard overwrite parquet hand-off. */
  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** Keyed upsert into a parquet dataset: existing rows whose key matches
    * an incoming row are replaced (left_anti on the keys), everything
    * else survives, incoming rows land as-is. The reference's only write
    * mode is full overwrite; this is the incremental-maintenance path.
    *
    * The merged frame is written to a sibling staging directory and then
    * renamed into place. Overwriting the source path directly would be
    * delete-then-write: any task retry or lost cached block after the
    * delete recomputes from already-deleted files and loses data. With
    * stage-and-swap the original directory stays intact until the new
    * dataset is fully committed; the swap itself is a filesystem rename.
    * (A table format — Delta/Iceberg — would make the commit transactional
    * even on object stores; no such jars in this environment.)
    */
  def upsertParquet(
      spark: SparkSession,
      incoming: DataFrame,
      keyCols: Seq[String],
      path: String): Unit = {
    val target = Paths.get(path)
    val exists = Files.exists(target)
    val merged = if (exists) {
      val current = spark.read.parquet(path)
      current.join(incoming.select(keyCols.map(col): _*), keyCols, "left_anti")
        .unionByName(incoming)
    } else incoming
    val staging = target.resolveSibling(
      target.getFileName.toString + s".staging-${System.nanoTime()}")
    merged.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    // Swap order matters for crash safety: park the old directory aside,
    // move the staging dir in, and only then delete the old copy. A crash
    // between the two moves leaves the data recoverable under `.old-*`;
    // delete-before-move would leave NO directory at `path`, and the next
    // upsert would silently treat the table as empty.
    if (exists) {
      val retired = target.resolveSibling(
        target.getFileName.toString + s".old-${System.nanoTime()}")
      Files.move(target, retired, StandardCopyOption.ATOMIC_MOVE)
      Files.move(staging, target, StandardCopyOption.ATOMIC_MOVE)
      deleteRecursively(retired)
    } else
      Files.move(staging, target, StandardCopyOption.ATOMIC_MOVE)
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val children = {
        val s = Files.list(p)
        try s.iterator().asScala.toSeq finally s.close()
      }
      children.foreach(deleteRecursively)
    }
    Files.deleteIfExists(p)
  }

  /** ORC read/write — the second columnar interchange format (Spark's
    * native ORC datasource; orc-core ships in this Spark distribution).
    * Same scan properties as parquet: column pruning and predicate
    * pushdown reach the reader, so a lake can mix parquet and ORC
    * tables without plan-quality loss. Beyond the reference's surface
    * (it is parquet-only); here for interchange with ORC-native
    * warehouses. */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** S5: single-file CSV export — coalesce(1), write to a tmp dir, then
    * move the lone part file to the artifact path
    * ≙ `jobs/04_train_and_export_submission.py:49-56`. Only the final
    * export narrows to one partition; upstream stays parallel.
    */
  def exportSingleCsv(df: DataFrame, artifactPath: String): Path = {
    val tmp = Files.createTempDirectory("graft_csv_export")
    val tmpOut = tmp.resolve("out").toString
    df.coalesce(1).write.option("header", "true").mode(SaveMode.Overwrite).csv(tmpOut)
    val part = Files.list(Paths.get(tmpOut)).iterator().asScala
      .find(_.getFileName.toString.matches("part-.*\\.csv"))
      .getOrElse(throw new IllegalStateException(s"no part file in $tmpOut"))
    val target = Paths.get(artifactPath)
    if (target.getParent != null) Files.createDirectories(target.getParent)
    Files.move(part, target, StandardCopyOption.REPLACE_EXISTING)
    target
  }
}
