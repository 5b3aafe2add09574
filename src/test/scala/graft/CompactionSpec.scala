package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Checksum
import graft.sources.ManifestCommit

/** Round-5 wave 15: manifest compaction — bin-packing small files
  * under the commit protocol without changing a single row.
  */
class CompactionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir = Files.createTempDirectory("compact").toString

  private lazy val rows = (1L to 5000L).map(i => (i, s"v$i", i % 97))
    .toDF("id", "v", "g")

  test("compaction shrinks the file count and changes no row") {
    val dir = freshDir
    val g1 = ManifestCommit.writeVersioned(rows.repartition(16), dir)
    val before = ManifestCommit.latest(dir).get._2
    assert(before.size == 16)
    val g2 = ManifestCommit.compact(spark, dir, targetBytes = 1L << 40)
    assert(g2 > g1)
    val after = ManifestCommit.latest(dir).get._2
    assert(after.size == 1, s"expected 1 packed file, got ${after.size}")
    // multiset equality via the anti-entropy checksums
    val cols = Seq("id", "v", "g")
    assert(Checksum.diffBuckets(
      Checksum.bucketChecksums(rows, cols, 16),
      Checksum.bucketChecksums(ManifestCommit.read(spark, dir), cols, 16))
      .count() == 0L)
    // pre-compaction generation still time-travels until vacuum
    assert(ManifestCommit.readAt(spark, dir, g1).count() == 5000L)
    // vacuum reclaims the 16 small files, the compacted gen survives
    val removed = ManifestCommit.vacuum(dir)
    // the superseded generation's whole data dir goes
    assert(removed.exists(_.startsWith("data-")))
    assert(ManifestCommit.read(spark, dir).count() == 5000L)
  }

  test("an already-compact dataset is a no-op (same generation back)") {
    val dir = freshDir
    val g1 = ManifestCommit.writeVersioned(rows.repartition(2), dir)
    assert(ManifestCommit.compact(spark, dir, targetBytes = 10L) == g1)
    assert(ManifestCommit.latest(dir).get._1 == g1)
  }

  test("compaction regenerates zone-map stats for the new generation") {
    val dir = freshDir
    ManifestCommit.writeVersionedWithStats(
      rows.repartition(8), dir, Seq("id"))
    val g2 = ManifestCommit.compact(spark, dir, targetBytes = 1L << 40,
      statsCols = Seq("id"))
    val zs = ManifestCommit.stats(dir, g2)
    assert(zs.nonEmpty && zs.get.nonEmpty, "compacted gen must carry stats")
    // the packed file's min/max cover the whole id range
    val s = zs.get.filter(_.column == "id")
    assert(s.flatMap(_.min).map(_.toLong).min == 1L)
    assert(s.flatMap(_.max).map(_.toLong).max == 5000L)
  }
}
