package graft.sources
import graft.Materialize.MatOps

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
  *
  * [[writeVersionedWithStats]] additionally publishes per-file zone maps
  * (min/max per column) in a `_stats-<gen>` sidecar; [[readBetween]]
  * uses them to open only the files a range predicate can touch — the
  * data-skipping half of the table-format story (see its scaladoc for
  * the crash/fallback contract).
  */
object ManifestCommit {

  private val ManifestPrefix = "_manifest-"
  private val StatsPrefix = "_stats-"
  private val BloomPrefix = "_bloom-"
  private val TxnPrefix = "#txn="
  private val SchemaPrefix = "#schema="

  /** A writer lost an optimistic-concurrency race: another commit
    * claimed the generation this transaction was based on. The loser's
    * staged data dir is an invisible orphan ([[vacuum]] reclaims it);
    * re-read the table and retry the whole transaction. */
  final class ConcurrentWriteException(msg: String)
    extends RuntimeException(msg)

  private def manifestGen(p: Path): Long =
    p.getFileName.toString.stripPrefix(ManifestPrefix).toLong

  /** One zone-map row: a file's min/max for one column (None = the
    * column is all-null in that file). Values are the column's Spark
    * string cast — numeric tags parse back exactly (shortest-decimal
    * round-trips). Non-numeric, non-string tags (date/timestamp/...)
    * are stored but never trusted for pruning: the caller's bound
    * formatting need not match Spark's cast (see tryCmp). */
  final case class ZoneStat(file: String, column: String, typeTag: String,
      min: Option[String], max: Option[String])

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
      // "#"-prefixed lines are metadata (streaming txn markers), not files
      Some(manifestGen(m) -> Files.readAllLines(m).asScala.toSeq
        .filter(l => l.nonEmpty && !l.startsWith("#")))
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
    * come back via the per-generation basePath, pruning included.
    *
    * A manifest carrying a `#schema=` marker (appends, schema-evolved
    * tables) reads with that COMMITTED schema instead of footer
    * inference — files written before an added column fill it with
    * nulls, no mergeSchema footer sweep needed, and a marker-only
    * generation (a streaming table whose only batches so far were
    * empty) reads as an empty DataFrame of the committed schema
    * rather than throwing at a polling reader. */
  def readAt(spark: SparkSession, path: String, gen: Long): DataFrame = {
    val manifest = Paths.get(path).resolve(f"$ManifestPrefix$gen%010d")
    require(Files.exists(manifest), s"no manifest for generation $gen under $path")
    val lines = Files.readAllLines(manifest).asScala.toSeq.filter(_.nonEmpty)
    val files = filesOf(lines)
    val schema = schemaOf(lines)
    if (files.isEmpty) schema match {
      case Some(st) => spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), st)
      case None => throw new IllegalStateException(
        s"manifest $manifest lists no files and carries no schema")
    }
    else readFiles(spark, path, files, schema)
  }

  /** Read a manifest's (sub)set of dataset-relative files. The
    * basePath is the DATASET ROOT, not a generation dir: a manifest
    * may reference files from several generations' data dirs (e.g.
    * after [[deleteWhere]] republishes untouched files in place), and
    * partition discovery only parses `k=v` segments, so the
    * `data-<gen>-<nonce>` level is transparently skipped while
    * Hive-style partition columns still come back. */
  private def readFiles(spark: SparkSession, path: String,
      files: Seq[String],
      schema: Option[org.apache.spark.sql.types.StructType] = None)
      : DataFrame = {
    val r0 = spark.read.option("basePath", Paths.get(path).toString)
    schema.fold(r0)(r0.schema)
      .parquet(files.map(f => Paths.get(path).resolve(f).toString): _*)
  }

  /** Recursively list the part files under a data dir (partitioned
    * writes nest them in k=v subdirs). */
  private def partFilesUnder(p: Path): Seq[Path] = listDir(p).flatMap { c =>
    if (Files.isDirectory(c)) partFilesUnder(c)
    else if (c.getFileName.toString.matches("part-.*\\.parquet")) Seq(c)
    else Seq.empty
  }

  /** Write `df` as a new generation and publish it. Returns the committed
    * generation number. The data write happens BEFORE any metadata
    * becomes visible; the publish is a single atomic manifest link.
    * `partitionBy` lands Hive-style subdirs inside the generation's data
    * dir (manifest entries carry the relative subpaths), so readers get
    * partition pruning via the basePath in [[readAt]]. */
  def writeVersioned(df: DataFrame, path: String,
      partitionBy: Seq[String] = Seq.empty): Long =
    stageAndPublish(df, path, partitionBy, () => ())

  /** Optimistic-concurrency write — the Delta conflict-detection
    * behavior [[writeVersioned]] deliberately lacks (there, a loser
    * re-publishes one generation higher: last-writer-wins). Here the
    * transaction is pinned to the parent generation it was BASED on:
    * commit happens exactly at parent+1, and if another writer claimed
    * that generation first — before the data write (stale
    * `expectedParentGen`, detected cheaply up front) or during it (the
    * publish link hits EEXIST) — the loser fails LOUDLY with
    * [[ConcurrentWriteException]] instead of silently clobbering the
    * winner's view. The loser's staged files stay an invisible orphan
    * for [[vacuum]]; correct recovery is re-read + re-derive + retry.
    *
    * `expectedParentGen = None` bases the transaction on the latest
    * generation at entry (read-modify-write callers that derived `df`
    * from an earlier [[read]] should pass that read's generation). 0
    * means "I expect to CREATE this table". */
  def writeVersionedExclusive(df: DataFrame, path: String,
      expectedParentGen: Option[Long] = None,
      partitionBy: Seq[String] = Seq.empty): Long = {
    val current = latest(path).map(_._1).getOrElse(0L)
    expectedParentGen.filter(_ != current).foreach { e =>
      throw new ConcurrentWriteException(
        s"stale base generation: transaction based on $e but table is " +
          s"at $current under $path — re-read and retry")
    }
    stageAndPublish(df, path, partitionBy, () => (),
      exclusiveParent = Some(expectedParentGen.getOrElse(current)))
  }

  /** The ONE stage-and-publish body (gen/nonce/data-dir naming, the
    * partitioned write, part discovery, marker carry, atomic publish)
    * shared by [[writeVersioned]] and [[writeVersionedChecked]] —
    * `afterWrite` runs between the data write and the publish and may
    * THROW to abort with the staged files left as an invisible,
    * vacuumable orphan. */
  private def stageAndPublish(
      frame: DataFrame,
      path: String,
      partitionBy: Seq[String],
      afterWrite: () => Unit,
      exclusiveParent: Option[Long] = None): Long = {
    val dir = Paths.get(path)
    Files.createDirectories(dir)
    val firstGen =
      exclusiveParent.map(_ + 1)
        .getOrElse(latest(path).map(_._1).getOrElse(0L) + 1)
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val dataDir = s"data-$firstGen-$nonce"
    val writer = frame.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(dir.resolve(dataDir).toString)
    afterWrite()
    val parts = partFilesUnder(dir.resolve(dataDir))
      .map(p => dir.relativize(p).toString)
      .sorted
    require(parts.nonEmpty, s"parquet write produced no part files in $dataDir")
    // carry the streaming txn ledger through full rewrites too — a
    // maintenance write must not reopen the door to batch replays.
    // The OLD #schema marker is not carried (a rewrite may narrow the
    // schema), but the NEW schema is committed fresh from the written
    // frame: it costs one line, and it keeps the next appendBatch off
    // the footer-scan fallback — without it, every streaming batch
    // after a compact/writeVersioned pays a readFiles footer pass over
    // the whole table to re-infer what this write already knew.
    publish(dir,
      parts ++ carriedMarkers(path) :+ schemaMarker(nullable(frame.schema)),
      firstGen, nonce,
      retryOnConflict = exclusiveParent.isEmpty)
  }

  /** Write-audit-publish: the data files are written and the quality
    * gate evaluated BEFORE the manifest link goes live — a failing
    * expectation leaves the previous generation as the published
    * state and the staged files as an invisible orphan ([[vacuum]]
    * reclaims them). This is the WAP pattern every serious table
    * pipeline runs: bad data must never become readable, and with
    * [[graft.operators.Expectations.observed]] the audit metrics ride
    * the write itself — validation costs ZERO extra passes over `df`.
    *
    * Returns the committed generation; throws IllegalStateException
    * (naming each failing check and its violation count) without
    * publishing when any check has violations.
    */
  def writeVersionedChecked(
      df: DataFrame,
      path: String,
      checks: Seq[graft.operators.Expectations.Check],
      partitionBy: Seq[String] = Seq.empty): Long = {
    require(checks.nonEmpty, "at least one check (else use writeVersioned)")
    val (instrumented, obs) =
      graft.operators.Expectations.observed(df, checks)
    // close() in finally: if the WRITE job itself throws, get() never
    // runs and the handle's session-global listener would leak —
    // fatal in a long-lived driver retrying checked writes
    try stageAndPublish(instrumented, path, partitionBy, () => {
      val metrics = obs.get()
      val failing = checks
        .map(c => c.name -> metrics(s"viol_${c.name}").asInstanceOf[Long])
        .filter(_._2 > 0)
      if (failing.nonEmpty)
        throw new IllegalStateException(
          "write-audit-publish aborted, staged generation NOT published: " +
            failing.map { case (n, v) => s"$n=$v" }.mkString(", "))
    })
    finally obs.close()
  }

  /** Latest manifest's RAW lines (files + metadata markers), one read
    * — the shared parse [[latest]]/[[committedTxns]]/[[appendBatch]]
    * derive from (one LIST+GET per consult, not two). */
  private def latestRaw(path: String): Option[(Long, Seq[String])] = {
    val dir = Paths.get(path)
    if (!Files.isDirectory(dir)) return None
    val manifests = listDir(dir)
      .filter(_.getFileName.toString.startsWith(ManifestPrefix))
    if (manifests.isEmpty) None
    else {
      val m = manifests.maxBy(manifestGen)
      Some(manifestGen(m) ->
        Files.readAllLines(m).asScala.toSeq.filter(_.nonEmpty))
    }
  }

  private def txnsOf(lines: Seq[String]): Set[String] =
    lines.filter(_.startsWith(TxnPrefix)).map(_.stripPrefix(TxnPrefix)).toSet

  private def filesOf(lines: Seq[String]): Seq[String] =
    lines.filterNot(_.startsWith("#"))

  import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

  /** Decode a manifest's committed-schema marker (base64 of the Spark
    * schema JSON — one line, no '#'/newline hazards). */
  private def schemaOf(lines: Seq[String]): Option[StructType] =
    lines.find(_.startsWith(SchemaPrefix)).map { l =>
      DataType.fromJson(new String(
        java.util.Base64.getDecoder.decode(l.stripPrefix(SchemaPrefix)),
        java.nio.charset.StandardCharsets.UTF_8)).asInstanceOf[StructType]
    }

  private def schemaMarker(st: StructType): String =
    SchemaPrefix + java.util.Base64.getEncoder.encodeToString(
      st.json.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Top-level-nullable copy: committed schemas are stored nullable so
    * old files missing an added column read as nulls without parquet
    * required/optional friction. */
  private def nullable(st: StructType): StructType =
    StructType(st.fields.map(_.copy(nullable = true)))

  /** The COMMITTED schema of the latest generation, if this table has
    * one — since round 9 every publish path (appends, schema
    * evolution, AND full rewrites via stageAndPublish) commits a
    * marker, so None means a pre-round-9 manifest or external
    * tampering; readers still fall back to footer inference then. */
  def tableSchema(path: String): Option[StructType] =
    latestRaw(path).flatMap(r => schemaOf(r._2))

  /** Schema marker line(s) a same-schema successor manifest must carry
    * (delete/upsert republish a SUBSET of mixed-schema files, so the
    * committed schema stays load-bearing). Full rewrites do not carry
    * the OLD marker — stageAndPublish commits a FRESH one from the
    * written frame, keeping the next appendBatch off the footer-scan
    * fallback. */
  private def carriedSchemaLine(path: String): Seq[String] =
    latestRaw(path).toSeq.flatMap(r =>
      r._2.find(_.startsWith(SchemaPrefix)))

  /** Delta-style mergeSchema: same-name fields must type-match exactly
    * (loud failure otherwise), table-absent append columns are
    * appended, append-absent table columns stay (old files simply
    * lack them). Everything lands nullable. */
  /** Type equality modulo nullability at EVERY nesting level: a
    * parquet read-back infers array<int> containsNull=true where the
    * in-memory frame that wrote it said containsNull=false — that is
    * the same type, not an evolution conflict. */
  private def sameTypeIgnoreNullability(a: DataType, b: DataType): Boolean =
    (a, b) match {
      case (x: ArrayType, y: ArrayType) =>
        sameTypeIgnoreNullability(x.elementType, y.elementType)
      case (x: MapType, y: MapType) =>
        sameTypeIgnoreNullability(x.keyType, y.keyType) &&
          sameTypeIgnoreNullability(x.valueType, y.valueType)
      case (x: StructType, y: StructType) =>
        x.fields.length == y.fields.length &&
          x.fields.zip(y.fields).forall { case (f, g) =>
            f.name == g.name &&
              sameTypeIgnoreNullability(f.dataType, g.dataType)
          }
      case _ => a == b
    }

  private def mergeSchemas(prev: StructType, next: StructType,
      allowNew: Boolean): StructType = {
    val byName = prev.fields.map(f => f.name -> f).toMap
    val conflicts = next.fields.flatMap { f =>
      byName.get(f.name)
        .filterNot(p => sameTypeIgnoreNullability(p.dataType, f.dataType))
        .map(p =>
          s"${f.name}: table=${p.dataType.simpleString} " +
            s"append=${f.dataType.simpleString}")
    }
    if (conflicts.nonEmpty) throw new IllegalStateException(
      "schema evolution type conflict (incompatible append refused): " +
        conflicts.mkString("; "))
    val added = next.fields.filterNot(f => byName.contains(f.name))
    if (added.nonEmpty && !allowNew) throw new IllegalStateException(
      s"append adds columns ${added.map(_.name).mkString(", ")} — pass " +
        "mergeSchema=true to widen the table schema")
    nullable(StructType(prev.fields ++ added))
  }

  /** The (appId:batchId) transaction markers carried by the LATEST
    * manifest — the replay ledger [[appendBatch]] consults. Markers
    * accumulate forward through EVERY manifest-publishing operation
    * (append, delete, upsert, compact, full rewrite — each carries the
    * previous manifest's markers), so the newest manifest alone holds
    * the full history and [[vacuum]] (which keeps only that manifest)
    * never loses replay protection. */
  def committedTxns(path: String): Set[String] =
    latestRaw(path).map(r => txnsOf(r._2)).getOrElse(Set.empty)

  /** Marker lines to carry into a successor manifest. */
  private def carriedMarkers(path: String): Seq[String] =
    committedTxns(path).toSeq.sorted.map(TxnPrefix + _)

  /** Idempotent exactly-once streaming APPEND — the foreachBatch sink
    * for this table format: each micro-batch lands as a new generation
    * whose manifest lists the previous generation's files + the new
    * data files + a `#txn=appId:batchId` marker line. The marker
    * commits ATOMICALLY with the data (it lives inside the manifest,
    * and the manifest publish is one hard link), so a replayed batch —
    * Structured Streaming's at-least-once redelivery after a crash —
    * is detected by [[committedTxns]] and skipped without writing:
    * at-least-once delivery × idempotent commit = exactly-once tables.
    *
    * Single-writer contract (the streaming norm): concurrent
    * non-append writers can interleave manifests that drop marker
    * history or files; one streaming query owns the table.
    *
    * @return Some(generation) if committed, None if this
    *         (appId, batchId) was already committed (replay)
    */
  def appendBatch(
      batch: DataFrame,
      path: String,
      appId: String,
      batchId: Long,
      partitionBy: Seq[String] = Seq.empty): Option[Long] = {
    require(appId.nonEmpty && !appId.contains(":") && !appId.contains("\n"),
      s"appId must be non-empty without ':' or newline: '$appId'")
    val key = s"$appId:$batchId"
    val dir = Paths.get(path)
    Files.createDirectories(dir)
    // ONE manifest read serves both the replay check and the file list
    val prev = latestRaw(path)
    val prevTxns = prev.map(r => txnsOf(r._2)).getOrElse(Set.empty)
    if (prevTxns.contains(key)) return None
    val prevFiles = prev.map(r => filesOf(r._2)).getOrElse(Seq.empty)
    val firstGen = prev.map(_._1).getOrElse(0L) + 1
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val dataDir = s"data-$firstGen-$nonce"
    val writer = batch.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(dir.resolve(dataDir).toString)
    // an EMPTY partitioned batch writes no part files (dynamic-partition
    // writers open files on the first row) — that is a legal streaming
    // micro-batch, and it must still COMMIT its marker or the query
    // crashes here and replays forever; publish a marker-only
    // generation carrying the previous files
    val newParts = partFilesUnder(dir.resolve(dataDir))
      .map(p => dir.relativize(p).toString)
    // persist the committed schema with every streaming append: a
    // marker-only generation (legal first empty batch) must still read
    // back as an EMPTY frame of the right shape at a polling reader,
    // not as "manifest lists no files". When the previous manifest has
    // no marker but DOES list files (writeVersioned tables, or any
    // table after compact/stageAndPublish, which intentionally drop
    // it), the batch schema alone is NOT authoritative — a narrower
    // batch would commit a schema that hides existing columns on every
    // later readAt. Mirror appendVersioned: infer the prior schema
    // from the files and merge (type conflicts fail loudly; batch-new
    // columns widen, prior columns stay).
    val prevSchema = prev.flatMap(r => schemaOf(r._2)).orElse(
      if (prevFiles.nonEmpty)
        Some(readFiles(batch.sparkSession, path, prevFiles).schema)
      else None)
    val schemaLine = schemaMarker(prevSchema match {
      case None => nullable(batch.schema)
      case Some(ps) => mergeSchemas(ps, batch.schema, allowNew = true)
    })
    val markers = (prevTxns + key).toSeq.sorted.map(TxnPrefix + _) :+
      schemaLine
    Some(publish(dir, (prevFiles ++ newParts).sorted ++ markers,
      firstGen, nonce))
  }

  /** Batch APPEND as a new generation (previous files re-referenced +
    * this write's files), with Delta-style schema evolution: by
    * default the incoming schema must introduce no new columns (loud
    * failure names them); with `mergeSchema = true` new columns WIDEN
    * the committed table schema — readers see them as null on
    * pre-evolution files via the manifest's `#schema=` marker, with no
    * footer-merge sweep at read time (at 100 TB, mergeSchema-on-read
    * is a million-footer LIST+GET storm; committing the schema with
    * the manifest makes evolution O(1) at the reader). Same-name
    * type conflicts fail loudly in BOTH modes. Concurrency: a writer
    * that loses the generation race throws
    * [[ConcurrentWriteException]] rather than silently dropping the
    * winner's appended files — re-call to rebase and retry. */
  def appendVersioned(df: DataFrame, path: String,
      partitionBy: Seq[String] = Seq.empty,
      mergeSchema: Boolean = false): Long = {
    val dir = Paths.get(path)
    Files.createDirectories(dir)
    val prev = latestRaw(path)
    val prevFiles = prev.map(r => filesOf(r._2)).getOrElse(Seq.empty)
    val prevSchema = prev.flatMap(r => schemaOf(r._2)).orElse(
      if (prevFiles.nonEmpty)
        Some(readFiles(df.sparkSession, path, prevFiles).schema)
      else None)
    val committed = prevSchema match {
      case None => nullable(df.schema)
      case Some(ps) => mergeSchemas(ps, df.schema, allowNew = mergeSchema)
    }
    val firstGen = prev.map(_._1).getOrElse(0L) + 1
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val dataDir = s"data-$firstGen-$nonce"
    val writer = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(dir.resolve(dataDir).toString)
    val newParts = partFilesUnder(dir.resolve(dataDir))
      .map(p => dir.relativize(p).toString)
    // NO conflict retry: this manifest's file list was built from the
    // generation read at entry, so re-publishing one generation higher
    // after losing a race would silently DROP the winner's files (a
    // lost update — the exact anomaly writeVersionedExclusive exists
    // to prevent). A loser fails loudly; re-call appendVersioned to
    // rebase on the new latest.
    publish(dir,
      (prevFiles ++ newParts).sorted ++ carriedMarkers(path) :+
        schemaMarker(committed),
      firstGen, nonce, retryOnConflict = false)
  }

  /** Stage the manifest content once, then publish by HARD LINK onto
    * the generation name: link(2) is atomic with the full content
    * visible AND fails with EEXIST if a concurrent writer claimed the
    * generation — unlike rename, which on POSIX silently REPLACES an
    * existing target (ATOMIC_MOVE onto a taken generation would
    * clobber the winner's manifest). The loser retries one generation
    * higher. An object store plays the same move with a
    * conditional/if-none-match put. */
  private def publish(dir: Path, parts: Seq[String], firstGen: Long,
      nonce: String, retryOnConflict: Boolean = true): Long = {
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
          case _: FileAlreadyExistsException if retryOnConflict => gen += 1
          case _: FileAlreadyExistsException =>
            throw new ConcurrentWriteException(
              s"generation $gen was claimed by a concurrent writer under " +
                s"$dir — this transaction's staged files are an orphan; " +
                "re-read and retry")
        }
      }
    } finally Files.deleteIfExists(tmp)
    committed
  }

  /** Write a new generation AND collect per-file zone maps (min/max of
    * `statsCols` per part file) into a `_stats-<gen>` sidecar — the
    * data-skipping kernel of every table format: at 100 TB a selective
    * scan must not OPEN 100 TB of files to find the 1% that can match.
    *
    * Stats collection re-reads only the new generation, column-pruned
    * to `statsCols` + `_metadata.file_path` (footer-cheap relative to
    * the write itself). The sidecar is written AFTER the manifest
    * publish — a crash in between leaves a perfectly readable
    * generation whose readers simply fall back to no skipping: stats
    * are an optimization, never load-bearing for correctness.
    */
  def writeVersionedWithStats(df: DataFrame, path: String,
      statsCols: Seq[String], partitionBy: Seq[String] = Seq.empty): Long = {
    require(statsCols.nonEmpty, "writeVersionedWithStats needs statsCols")
    val spark = df.sparkSession
    val gen = writeVersioned(df, path, partitionBy)
    val committed = readAt(spark, path, gen)
    val tags = committed.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    statsCols.foreach(c => require(tags.contains(c), s"no column $c to collect stats for"))
    import org.apache.spark.sql.functions.{col, max, min}
    val aggs = statsCols.flatMap(c => Seq(
      min(col(c)).cast("string").as(s"__min_$c"),
      max(col(c)).cast("string").as(s"__max_$c")))
    val rows = committed
      .select(col("_metadata.file_path").as("__file") +: statsCols.map(col): _*)
      .groupBy(col("__file"))
      .agg(aggs.head, aggs.tail: _*)
      .collect() // one row per part file — manifest-sized, not data-sized
    val dirAbs = Paths.get(path).toAbsolutePath.normalize.toString
    def rel(uri: String): String = {
      val p = if (uri.startsWith("file:")) java.net.URI.create(uri).getPath else uri
      p.stripPrefix(dirAbs).stripPrefix("/")
    }
    def b64(v: String): String = java.util.Base64.getEncoder
      .encodeToString(v.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val lines = rows.flatMap { r =>
      val file = rel(r.getString(0))
      statsCols.map { c =>
        val mn = Option(r.getAs[String](s"__min_$c")).map(b64).getOrElse("-")
        val mx = Option(r.getAs[String](s"__max_$c")).map(b64).getOrElse("-")
        s"$file\t$c\t${tags(c)}\t$mn\t$mx"
      }
    }.sorted.toSeq
    val dir = Paths.get(path)
    val tmp = dir.resolve(s".stats-tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    Files.write(tmp, lines.asJava)
    // the generation name is already uniquely claimed by the manifest
    // link, so a plain atomic move cannot race another writer
    Files.move(tmp, dir.resolve(f"$StatsPrefix$gen%010d"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    gen
  }

  /** Build a per-file BLOOM index sidecar `_bloom-<gen>` over an
    * integral `column` of the LATEST generation — the point-lookup
    * complement of zone maps: min/max prunes range scans on sorted-ish
    * layouts, a bloom prunes `column = v` probes on ANY layout (the
    * Delta bloom-index idea on the manifest protocol). Each committed
    * file gets its own filter sized to its row count; like the stats
    * sidecar it is written AFTER the generation is live, so a crash
    * merely degrades point reads to no skipping — never correctness.
    *
    * Build cost: one column-pruned read per part file (driver-looped
    * jobs — the sidecar builder's cost class, same as stats
    * collection). Returns the indexed generation.
    */
  def writeBloomIndex(spark: SparkSession, path: String, column: String,
      fpp: Double = 0.01): Long = {
    require(fpp > 0 && fpp < 1, s"fpp in (0,1): $fpp")
    val (gen, files) = latest(path).getOrElse(
      throw new IllegalStateException(s"no committed manifest under $path"))
    val dir = Paths.get(path)
    val lines = files.sorted.map { f =>
      val one = spark.read.parquet(dir.resolve(f).toString)
        .select(org.apache.spark.sql.functions.col(column))
        .where(org.apache.spark.sql.functions.col(column).isNotNull)
      val n = one.count()
      val bloom = one.stat.bloomFilter(column, math.max(n, 1L), fpp)
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      val b = java.util.Base64.getEncoder.encodeToString(bos.toByteArray)
      s"$f\t$column\t$b"
    }
    val tmp = dir.resolve(s".bloom-tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    Files.write(tmp, lines.asJava)
    Files.move(tmp, dir.resolve(f"$BloomPrefix$gen%010d"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    gen
  }

  /** The files of the latest generation that MIGHT contain
    * `column = value`, per the bloom sidecar: (kept, skipped). Files
    * not covered by a sidecar (absent, other column, crash) are kept —
    * a bloom miss PROVES absence, absence of a bloom proves nothing.
    */
  def prunePoint(path: String, column: String,
      value: Long): (Seq[String], Seq[String]) = {
    val (gen, files) = latest(path).getOrElse(
      throw new IllegalStateException(s"no committed manifest under $path"))
    val f = Paths.get(path).resolve(f"$BloomPrefix$gen%010d")
    if (!Files.exists(f)) return (files, Seq.empty)
    val blooms = Files.readAllLines(f).asScala.filter(_.nonEmpty).flatMap {
      l =>
        val Array(file, c, b) = l.split("\t", 3)
        if (c != column) None
        else Some(file -> org.apache.spark.util.sketch.BloomFilter.readFrom(
          new java.io.ByteArrayInputStream(
            java.util.Base64.getDecoder.decode(b))))
    }.toMap
    files.partition(f => blooms.get(f).forall(_.mightContainLong(value)))
  }

  /** Read `column = value` from the latest generation, opening only
    * files whose blooms might contain it; the exact filter keeps the
    * result correct at any false-positive rate (and pushes into the
    * parquet scan for row-group pruning inside kept files). */
  def readPoint(spark: SparkSession, path: String, column: String,
      value: Long): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val (kept, _) = prunePoint(path, column, value)
    val residual = col(column) === lit(value)
    if (kept.nonEmpty) readFiles(spark, path, kept, tableSchema(path))
      .where(residual)
    else read(spark, path).where(residual && lit(false))
  }

  /** Zone maps of a committed generation, or None when the sidecar is
    * absent (plain [[writeVersioned]], or a crash before the sidecar). */
  def stats(path: String, gen: Long): Option[Seq[ZoneStat]] = {
    val f = Paths.get(path).resolve(f"$StatsPrefix$gen%010d")
    if (!Files.exists(f)) None
    else Some(Files.readAllLines(f).asScala.toSeq.filter(_.nonEmpty).map { l =>
      val Array(file, c, tag, mn, mx) = l.split("\t", 5)
      def un(v: String): Option[String] =
        if (v == "-") None
        else Some(new String(java.util.Base64.getDecoder.decode(v),
          java.nio.charset.StandardCharsets.UTF_8))
      ZoneStat(file, c, tag, un(mn), un(mx))
    })
  }

  /** Typed ordering for zone-map strings, or None when the comparison
    * cannot be TRUSTED — unknown tag (timestamp/date/boolean/...: the
    * caller's bound formatting need not match Spark's string cast, and
    * a format mismatch here would silently prune files that match),
    * a bound that fails to parse as the column's type (e.g. "10.5"
    * against a long column), or non-ASCII strings (Java string order
    * matches Spark's UTF8String binary-UTF-8 order only for ASCII).
    * None always means "keep the file": mis-pruning loses rows, while
    * keeping only costs a read. Numerics parse exactly
    * (shortest-decimal round-trips). */
  private def tryCmp(tag: String, a: String, b: String): Option[Int] = {
    import scala.util.Try
    tag match {
      case "byte" | "short" | "integer" | "long" =>
        Try(java.lang.Long.compare(a.toLong, b.toLong)).toOption
      case "float" | "double" =>
        Try(java.lang.Double.compare(a.toDouble, b.toDouble)).toOption
      case t if t.startsWith("decimal") =>
        Try(BigDecimal(a).compare(BigDecimal(b))).toOption
      case "string" if allAscii(a) && allAscii(b) => Some(a.compareTo(b))
      case _ => None
    }
  }

  private def allAscii(s: String): Boolean = s.forall(_ < 128)

  /** Does the file's [min, max] overlap [lo, hi]? All-null stats (None)
    * never overlap a range predicate — `BETWEEN` is null-rejecting —
    * regardless of type; an UNTRUSTED comparison (tryCmp None) counts
    * as overlapping, so the file is kept. */
  private def overlaps(z: ZoneStat, lo: String, hi: String): Boolean =
    (z.min, z.max) match {
      case (Some(mn), Some(mx)) =>
        (tryCmp(z.typeTag, mx, lo), tryCmp(z.typeTag, mn, hi)) match {
          case (Some(cMaxLo), Some(cMinHi)) => cMaxLo >= 0 && cMinHi <= 0
          case _ => true
        }
      case _ => false
    }

  /** The latest generation's files split into (kept, pruned) for the
    * range predicate `column BETWEEN lo AND hi` — exposed so callers
    * (and specs) can observe skipping, not just benefit from it.
    * Files without a stat row for `column` are always kept. */
  def pruneBetween(path: String, column: String,
      lo: Any, hi: Any): (Seq[String], Seq[String]) = {
    val (gen, files) = latest(path).getOrElse(
      throw new IllegalStateException(s"no committed manifest under $path"))
    stats(path, gen) match {
      case None => (files, Seq.empty)
      case Some(zs) =>
        val byFile = zs.filter(_.column == column).map(z => z.file -> z).toMap
        val (ls, hs) = (String.valueOf(lo), String.valueOf(hi))
        files.partition { f =>
          byFile.get(f) match {
            case None => true
            case Some(z) => overlaps(z, ls, hs)
          }
        }
    }
  }

  /** Read `column BETWEEN lo AND hi` from the latest generation, opening
    * only files whose zone maps can overlap; the residual filter keeps
    * the result EXACT whatever the stats say (and still reaches the
    * parquet scan for row-group pruning inside kept files). Falls back
    * to a full-file-list scan when no sidecar exists. */
  def readBetween(spark: SparkSession, path: String, column: String,
      lo: Any, hi: Any): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val (kept, _) = pruneBetween(path, column, lo, hi)
    val residual = col(column) >= lit(lo) && col(column) <= lit(hi)
    if (kept.nonEmpty) {
      readFiles(spark, path, kept, tableSchema(path)).where(residual)
    } else {
      // nothing can match: read the schema from the manifest's files
      // with a constant-false filter (parquet pushdown scans no groups)
      read(spark, path).where(residual && lit(false))
    }
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

  /** Copy-on-write DELETE: remove every row of the latest generation
    * matching `condition`, REWRITING ONLY THE FILES THAT CONTAIN such
    * rows — untouched files are referenced in place by the new
    * manifest, byte-identical and never copied. This is the
    * table-format delete kernel (GDPR erasure, retention enforcement):
    * at 100 TB, deleting one user's rows must cost proportional to
    * the files that hold them — which a clustered layout
    * ([[graft.operators.ZOrder]], partitioning) makes few — not a
    * full-corpus rewrite.
    *
    * Mechanics: one predicate-pushed, `_metadata`-projected pass finds
    * the affected files; their surviving rows (rows where `condition`
    * is false or NULL — SQL DELETE semantics) are rewritten into a
    * fresh data dir; the new manifest lists untouched + rewritten
    * files and publishes atomically. Time travel to the pre-delete
    * generation keeps working until [[vacuum]], which reclaims the
    * affected originals while keeping the shared untouched files
    * (they are referenced by the latest manifest).
    *
    * Returns the new generation, or the current one when nothing
    * matches.
    */
  def deleteWhere(spark: SparkSession, path: String,
      condition: org.apache.spark.sql.Column,
      partitionBy: Seq[String] = Seq.empty): Long = {
    import org.apache.spark.sql.functions.{coalesce, col, lit, not}
    val (gen, files) = latest(path).getOrElse(
      throw new IllegalStateException(s"no committed manifest under $path"))
    val dir = Paths.get(path)
    val dirAbs = dir.toAbsolutePath.normalize.toString
    def rel(uri: String): String = {
      val p = if (uri.startsWith("file:")) java.net.URI.create(uri).getPath
        else uri
      p.stripPrefix(dirAbs).stripPrefix("/")
    }
    // honor the committed schema (mixed-schema tables): rewritten
    // survivors materialize the FULL schema, untouched files keep
    // their old one, and the carried #schema marker stays load-bearing
    val stored = tableSchema(path)
    val affected = readFiles(spark, path, files, stored)
      .where(condition)
      .select(col("_metadata.file_path"))
      .distinct().collect().map(r => rel(r.getString(0))).toSet
    if (affected.isEmpty) return gen
    val untouched = files.filterNot(affected)
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val survivors = readFiles(spark, path, affected.toSeq.sorted, stored)
      .where(not(coalesce(condition, lit(false))))
    val newParts =
      if (survivors.isEmpty) Seq.empty
      else {
        val dataDir = s"data-${gen + 1}-$nonce"
        val w = survivors.write.mode(SaveMode.Overwrite)
        (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
          .parquet(dir.resolve(dataDir).toString)
        partFilesUnder(dir.resolve(dataDir))
          .map(p => dir.relativize(p).toString)
      }
    val manifest = (untouched ++ newParts).sorted
    require(manifest.nonEmpty,
      "deleteWhere would delete every row of every file; write an empty " +
        "generation explicitly if that is intended")
    publish(dir, manifest ++ carriedMarkers(path) ++
      carriedSchemaLine(path), gen + 1, nonce)
  }

  /** Copy-on-write keyed UPSERT — [[upsert]]'s semantics (incoming
    * rows replace same-key rows) at [[deleteWhere]]'s cost: only the
    * files CONTAINING a matched key rewrite; everything else is
    * referenced in place. The plain [[upsert]] rewrites the whole
    * dataset every run — correct, but at 100 TB the nightly 0.1%
    * upsert must touch 0.1% of files (clustered layouts make the
    * affected set small), not 100%.
    *
    * The affected-file probe is one `_metadata`-projected semi join
    * against the (broadcastable) incoming key set; survivors of the
    * affected files are anti-joined on the key and rewritten together
    * with ALL incoming rows into the new data dir.
    */
  def upsertByKey(
      spark: SparkSession,
      incoming: DataFrame,
      keyCol: String,
      path: String,
      partitionBy: Seq[String] = Seq.empty): Long = {
    import org.apache.spark.sql.functions.col
    val (gen, files) = latest(path).getOrElse {
      return writeVersioned(incoming, path, partitionBy)
    }
    val dir = Paths.get(path)
    val dirAbs = dir.toAbsolutePath.normalize.toString
    def rel(uri: String): String = {
      val p = if (uri.startsWith("file:")) java.net.URI.create(uri).getPath
        else uri
      p.stripPrefix(dirAbs).stripPrefix("/")
    }
    val keys = incoming.select(col(keyCol)).distinct().materialize()
    val stored = tableSchema(path) // mixed-schema tables read committed
    // project the hidden _metadata column BEFORE the join — it only
    // resolves against the file-source relation itself
    val affected = readFiles(spark, path, files, stored)
      .select(col("_metadata.file_path").as("__file"), col(keyCol))
      .join(keys, Seq(keyCol), "left_semi")
      .select(col("__file"))
      .distinct().collect().map(r => rel(r.getString(0))).toSet
    val untouched = files.filterNot(affected)
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val survivors =
      if (affected.isEmpty) incoming
      else readFiles(spark, path, affected.toSeq.sorted, stored)
        .join(keys, Seq(keyCol), "left_anti")
        .unionByName(incoming)
    val dataDir = s"data-${gen + 1}-$nonce"
    val w = survivors.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(dir.resolve(dataDir).toString)
    val newParts = partFilesUnder(dir.resolve(dataDir))
      .map(p => dir.relativize(p).toString)
    publish(dir, (untouched ++ newParts).sorted ++ carriedMarkers(path) ++
      carriedSchemaLine(path), gen + 1, nonce)
  }

  /** Compact the latest generation's small files into ~`targetBytes`
    * files — the OPTIMIZE/bin-packing half of the table-format story
    * (zone maps being the other). Small files are the failure mode of
    * incremental writes: a 100 TB table accreted in 10 MB upserts pays
    * per-file open/footer/list costs thousands of times per scan. This
    * rewrites the CURRENT rows into ceil(totalBytes / targetBytes)
    * files and publishes them as a NEW generation: readers never see a
    * half-compacted state, time travel to the pre-compaction
    * generation keeps working until [[vacuum]], and a crash mid-rewrite
    * leaves only an invisible orphan data dir. Row content is
    * untouched — multiset equality under compaction is spec-pinned
    * with [[graft.operators.Checksum]].
    *
    * No-op (returns the current generation) when the current layout
    * already meets the target file count. `layout` optionally imposes
    * an ordering on the way out (e.g. a
    * [[graft.operators.ZOrder.layoutBy]] pass — compaction is the
    * natural moment to re-cluster); it receives the rows and the
    * target file count and must partition into exactly that many
    * files' worth of partitions. `statsCols` regenerates the zone-map
    * sidecar for the compacted generation.
    */
  def compact(
      spark: SparkSession,
      path: String,
      targetBytes: Long,
      statsCols: Seq[String] = Seq.empty,
      partitionBy: Seq[String] = Seq.empty,
      layout: (DataFrame, Int) => DataFrame =
        (df, n) => df.repartition(n)): Long = {
    require(targetBytes > 0, s"targetBytes must be > 0: $targetBytes")
    val (gen, files) = latest(path).getOrElse(
      throw new IllegalStateException(s"no committed manifest under $path"))
    val dir = Paths.get(path)
    val totalBytes = files.map(f => Files.size(dir.resolve(f))).sum
    val nTarget = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes)
    if (nTarget >= files.size) return gen // already compact enough
    val packed = layout(readAt(spark, path, gen), nTarget.toInt)
    // a partitioned dataset must re-state partitionBy or compaction
    // would flatten its Hive-style subdirs and readers would lose
    // partition pruning — the caller owns the layout contract
    if (statsCols.nonEmpty)
      writeVersionedWithStats(packed, path, statsCols, partitionBy)
    else writeVersioned(packed, path, partitionBy)
  }

  /** OPTIMIZE scheduling for append-accreted tables: compact only when
    * the latest manifest references more than `maxFiles` files — the
    * trigger a streaming ingest pipeline calls after every batch so
    * small-file buildup self-heals without a separate maintenance job
    * paying a rewrite per trigger. Returns Some(new generation) when a
    * compaction ran, None when the table is already within budget. The
    * txn ledger survives ([[compact]] publishes through
    * [[writeVersioned]], which carries markers), so replay protection
    * holds across maintenance. */
  def compactIfNeeded(
      spark: SparkSession,
      path: String,
      targetBytes: Long,
      maxFiles: Int,
      statsCols: Seq[String] = Seq.empty,
      partitionBy: Seq[String] = Seq.empty): Option[Long] = {
    require(maxFiles >= 1, s"maxFiles must be >= 1: $maxFiles")
    latest(path) match {
      case Some((gen, files)) if files.size > maxFiles =>
        // compact() itself no-ops (returns the CURRENT gen) when the
        // bin-packing target needs >= the existing file count — e.g.
        // many files that are each already target-sized. Surfacing
        // that as Some(<old gen>) would log a compaction that never
        // happened while the file count keeps growing; report honestly
        val out = compact(spark, path, targetBytes, statsCols, partitionBy)
        if (out == gen) None else Some(out)
      case _ => None
    }
  }

  /** Retention policy: expire every generation except the newest
    * `keepLast` — the bounded form of time travel every production
    * table runs (Delta's RETAIN, Iceberg's expire_snapshots). Deletes
    * the expired manifests (+ their stats/bloom sidecars) and every
    * part file referenced ONLY by expired generations; a file shared
    * with a surviving generation stays (append-mode manifests
    * re-reference old files, so reference counting is per-file, not
    * per-generation). Time travel keeps working for every surviving
    * generation, and the streaming txn ledger survives because
    * markers are carried forward into the newest manifest
    * ([[appendBatch]]'s contract). Returns the deleted entries.
    *
    * Unlike [[vacuum]] (which keeps only the LATEST generation's
    * files and exists for orphan cleanup), this is the policy knob:
    * `expireGenerations(p, 1)` + `vacuum(p)` is maximal reclamation.
    */
  def expireGenerations(path: String, keepLast: Int): Seq[String] = {
    require(keepLast >= 1, s"keepLast must be >= 1: $keepLast")
    val dir = Paths.get(path)
    if (!Files.isDirectory(dir)) return Seq.empty
    val manifests = listDir(dir)
      .filter(_.getFileName.toString.startsWith(ManifestPrefix))
      .sortBy(manifestGen)
    if (manifests.size <= keepLast) return Seq.empty
    val (expired, survivors) =
      manifests.splitAt(manifests.size - keepLast)
    def filesIn(m: Path): Seq[String] =
      Files.readAllLines(m).asScala.toSeq
        .filter(l => l.nonEmpty && !l.startsWith("#"))
    val keepFiles =
      survivors.flatMap(filesIn).map(f => dir.resolve(f).normalize).toSet
    val removed = Seq.newBuilder[String]
    // ORDER MATTERS: drop the expired MANIFESTS (+sidecars) first,
    // THEN their now-orphaned part files. The reverse order has a bad
    // crash/concurrency window — files gone while manifests still name
    // them, so a time-travel reader (or a re-run after a mid-pass
    // crash) gets file-not-found instead of the honest "no manifest
    // for generation". Reading the expired file lists into memory
    // first (filesIn above) keeps the second pass independent of the
    // already-deleted manifests.
    val expiredFiles = expired.flatMap(filesIn).distinct
    expired.foreach { m =>
      val gen = manifestGen(m)
      Seq(m, dir.resolve(f"$StatsPrefix$gen%010d"),
        dir.resolve(f"$BloomPrefix$gen%010d")).foreach { p =>
        if (Files.exists(p)) {
          Files.delete(p); removed += p.getFileName.toString
        }
      }
    }
    expiredFiles.foreach { f =>
      val p = dir.resolve(f).normalize
      if (!keepFiles.contains(p) && Files.exists(p)) {
        Files.delete(p); removed += f
      }
    }
    removed.result()
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
          dir.resolve(f"$ManifestPrefix$gen%010d").normalize +
          dir.resolve(f"$StatsPrefix$gen%010d").normalize +
          dir.resolve(f"$BloomPrefix$gen%010d").normalize
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
          if (((name.startsWith(ManifestPrefix) || name.startsWith(StatsPrefix)
              || name.startsWith(BloomPrefix))
              && !keep.contains(child.normalize))
            || name.startsWith(".manifest-tmp-")
            || name.startsWith(".stats-tmp-")
            || name.startsWith(".bloom-tmp-")) {
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

  /** One schema-drift finding between two generations. `change` is
    * "added" | "removed" | "type_changed"; types are Spark simpleString
    * ("absent" for the missing side). */
  final case class SchemaChange(
      column: String, change: String, fromType: String, toType: String)

  /** Detect schema drift between two committed generations — the
    * ingest tripwire a versioned dataset runs before publishing
    * (round 5's environment drift was exactly an unnoticed type
    * change; this makes the same class of break a one-line report for
    * DATA, not just the env). Footer-only work: schemas come from the
    * generations' parquet metadata, nothing scans. Columns are
    * compared by name; order changes are not drift. */
  def schemaDiff(spark: SparkSession, path: String,
      fromGen: Long, toGen: Long): Seq[SchemaChange] = {
    def fields(g: Long): Map[String, String] =
      readAt(spark, path, g).schema.fields
        .map(f => f.name -> f.dataType.simpleString).toMap
    val a = fields(fromGen)
    val b = fields(toGen)
    val added = (b.keySet -- a.keySet).toSeq.sorted
      .map(c => SchemaChange(c, "added", "absent", b(c)))
    val removed = (a.keySet -- b.keySet).toSeq.sorted
      .map(c => SchemaChange(c, "removed", a(c), "absent"))
    val changed = (a.keySet & b.keySet).toSeq.sorted
      .filter(c => a(c) != b(c))
      .map(c => SchemaChange(c, "type_changed", a(c), b(c)))
    added ++ removed ++ changed
  }
}
