package graft.sources

import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import scala.jdk.CollectionConverters._

/** Manifest-committed parquet dataset — the object-store-safe commit
  * protocol that [[Lakehouse.upsertParquet]]'s stage-and-swap cannot give
  * (directory rename is atomic on POSIX, neither atomic nor cheap on
  * object stores). This is the Delta/Iceberg commit idea reduced to its
  * kernel, with no table-format jars:
  *
  *  - data files only ever ACCUMULATE under `path/data-<gen>-<nonce>/`;
  *    nothing is renamed or deleted on the write path;
  *  - a commit is ONE small file `path/_manifest-<gen>` listing the
  *    committed part files; readers resolve the highest generation and
  *    read exactly its files;
  *  - a crash after the data write but before the manifest write leaves
  *    an orphan data directory no reader ever sees — the previous
  *    generation stays the published state;
  *  - concurrent writers race on the manifest name: publication is an
  *    atomic hard-link onto `_manifest-<gen>` which fails if the
  *    generation is taken (rename would silently replace it), and the
  *    loser re-publishes the same data files under the next generation
  *    (on an object store, a conditional/if-none-match put plays the
  *    same role). Note the loser's manifest does NOT contain the
  *    winner's rows — last-writer-wins at dataset granularity, exactly
  *    the semantics of overwrite/upsert here.
  *
  * Orphans and superseded generations are reclaimed by [[vacuum]], which
  * must only run once no reader still holds an older manifest.
  */
object ManifestCommit {

  private val ManifestPrefix = "_manifest-"

  private def manifestGen(p: Path): Long =
    p.getFileName.toString.stripPrefix(ManifestPrefix).toLong

  private def listDir(dir: Path): Seq[Path] = {
    val s = Files.list(dir)
    try s.iterator().asScala.toSeq finally s.close()
  }

  /** Highest committed generation and its dataset-relative file list. */
  def latest(path: String): Option[(Long, Seq[String])] = {
    val dir = Paths.get(path)
    if (!Files.isDirectory(dir)) return None
    val manifests = listDir(dir)
      .filter(_.getFileName.toString.startsWith(ManifestPrefix))
    if (manifests.isEmpty) None
    else {
      val m = manifests.maxBy(manifestGen)
      Some(manifestGen(m) -> Files.readAllLines(m).asScala.toSeq.filter(_.nonEmpty))
    }
  }

  /** Read the latest committed generation — and ONLY its files: orphan
    * data from crashed writers and superseded generations are invisible
    * even though they share the directory. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val (gen, _) = latest(path).getOrElse(
      throw new IllegalStateException(s"no committed manifest under $path"))
    readAt(spark, path, gen)
  }

  /** Time travel: read a SPECIFIC committed generation (valid until a
    * vacuum reclaims it — the same contract as table-format history).
    * Partition columns written by [[writeVersioned]]'s `partitionBy`
    * come back via the per-generation basePath, pruning included. */
  def readAt(spark: SparkSession, path: String, gen: Long): DataFrame = {
    val manifest = Paths.get(path).resolve(f"$ManifestPrefix$gen%010d")
    require(Files.exists(manifest), s"no manifest for generation $gen under $path")
    val files = Files.readAllLines(manifest).asScala.toSeq.filter(_.nonEmpty)
    require(files.nonEmpty, s"manifest $manifest lists no files")
    // all of a generation's files share one data dir; basePath restores
    // partition columns from Hive-style subdirs (k=v/...) when present
    val dataDir = Paths.get(path).resolve(files.head.takeWhile(_ != '/'))
    spark.read.option("basePath", dataDir.toString)
      .parquet(files.map(f => Paths.get(path).resolve(f).toString): _*)
  }

  /** Write `df` as a new generation and publish it. Returns the committed
    * generation number. The data write happens BEFORE any metadata
    * becomes visible; the publish is a single atomic manifest link.
    * `partitionBy` lands Hive-style subdirs inside the generation's data
    * dir (manifest entries carry the relative subpaths), so readers get
    * partition pruning via the basePath in [[readAt]]. */
  def writeVersioned(df: DataFrame, path: String,
      partitionBy: Seq[String] = Seq.empty): Long = {
    val dir = Paths.get(path)
    Files.createDirectories(dir)
    val firstGen = latest(path).map(_._1).getOrElse(0L) + 1
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val dataDir = s"data-$firstGen-$nonce"
    val writer = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(dir.resolve(dataDir).toString)
    def partFiles(p: Path): Seq[Path] = listDir(p).flatMap { c =>
      if (Files.isDirectory(c)) partFiles(c)
      else if (c.getFileName.toString.matches("part-.*\\.parquet")) Seq(c)
      else Seq.empty
    }
    val parts = partFiles(dir.resolve(dataDir))
      .map(p => dir.relativize(p).toString)
      .sorted
    require(parts.nonEmpty, s"parquet write produced no part files in $dataDir")
    // stage the manifest content once, then publish by HARD LINK onto the
    // generation name: link(2) is atomic with the full content visible AND
    // fails with EEXIST if a concurrent writer claimed the generation —
    // unlike rename, which on POSIX silently REPLACES an existing target
    // (ATOMIC_MOVE onto a taken generation would clobber the winner's
    // manifest). The loser retries one generation higher. An object store
    // plays the same move with a conditional/if-none-match put.
    val tmp = dir.resolve(s".manifest-tmp-$nonce")
    Files.write(tmp, parts.asJava)
    var gen = firstGen
    var committed = -1L
    try {
      while (committed < 0) {
        try {
          Files.createLink(dir.resolve(f"$ManifestPrefix$gen%010d"), tmp)
          committed = gen
        } catch {
          case _: FileAlreadyExistsException => gen += 1
        }
      }
    } finally Files.deleteIfExists(tmp)
    committed
  }

  /** Keyed upsert ≙ [[Lakehouse.upsertParquet]] semantics (incoming rows
    * replace same-key rows, everything else survives) on the manifest
    * protocol: the merged frame READS the current generation's files and
    * WRITES only new ones, so no staging swap is needed — the published
    * state flips with the manifest commit. */
  def upsert(
      spark: SparkSession,
      incoming: DataFrame,
      keyCols: Seq[String],
      path: String): Long = {
    import org.apache.spark.sql.functions.col
    val merged = latest(path) match {
      case Some(_) =>
        read(spark, path)
          .join(incoming.select(keyCols.map(col): _*), keyCols, "left_anti")
          .unionByName(incoming)
      case None => incoming
    }
    writeVersioned(merged, path)
  }

  /** Delete everything the latest manifest does not reference: orphan
    * data directories from crashed writers (including their nested
    * `_temporary/...` trees), stale `.manifest-tmp-*` staging files, and
    * superseded generations' files + manifests. Only run once no reader
    * still holds an older manifest AND no writer is mid-commit (a
    * concurrent writer's staging tmp or un-published data dir looks
    * exactly like a crash orphan — same rule as every table format's
    * vacuum horizon). */
  def vacuum(path: String): Seq[String] = {
    val dir = Paths.get(path)
    latest(path) match {
      case None => Seq.empty
      case Some((gen, files)) =>
        val keep = files.map(f => dir.resolve(f).normalize).toSet +
          dir.resolve(f"$ManifestPrefix$gen%010d").normalize
        // the generation's TOP data dir is the first segment of each
        // entry — file parents may be partition subdirs (Season=.../)
        val keepDataDirs =
          files.map(f => dir.resolve(f.takeWhile(_ != '/')).normalize).toSet
        val removed = Seq.newBuilder[String]
        def dropUnreferencedParts(p: Path): Unit = listDir(p).foreach { f =>
          if (Files.isDirectory(f)) dropUnreferencedParts(f)
          else if (f.getFileName.toString.matches("part-.*\\.parquet") &&
            !keep.contains(f.normalize)) {
            Files.delete(f); removed += dir.relativize(f).toString
          }
        }
        listDir(dir).foreach { child =>
          val name = child.getFileName.toString
          if ((name.startsWith(ManifestPrefix) && !keep.contains(child.normalize))
            || name.startsWith(".manifest-tmp-")) {
            Files.delete(child); removed += name
          } else if (name.startsWith("data-") && !keepDataDirs.contains(child.normalize)) {
            // crashed writers leave nested _temporary/... trees — delete
            // recursively, not just one level
            deleteRecursively(child)
            removed += name
          } else if (name.startsWith("data-") && keepDataDirs.contains(child.normalize)) {
            // referenced dir: drop only unreferenced part files inside
            // (recursing into partition subdirs; _SUCCESS markers stay,
            // harmless)
            dropUnreferencedParts(child)
          }
        }
        removed.result().sorted
    }
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) listDir(p).foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
