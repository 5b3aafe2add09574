package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.ManifestCommit

/** Round-5 wave 20: copy-on-write DELETE — only affected files
  * rewrite, untouched files are shared across generations.
  */
class DeleteWhereSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("delete rewrites only the files holding matching rows") {
    val dir = Files.createTempDirectory("delw").toString
    val rows = (1L to 8000L).map(i => (i, s"u${i % 97}")).toDF("id", "user")
    // range layout: ids cluster, so a narrow id delete touches 1 file
    val g1 = ManifestCommit.writeVersioned(
      rows.repartitionByRange(8, $"id"), dir)
    val before = ManifestCommit.latest(dir).get._2.toSet
    val g2 = ManifestCommit.deleteWhere(spark, dir,
      col("id").between(100L, 120L))
    assert(g2 > g1)
    val after = ManifestCommit.latest(dir).get._2.toSet
    val shared = before.intersect(after)
    assert(shared.size == 7, s"expected 7 shared files, ${shared.size}")
    val got = ManifestCommit.read(spark, dir)
    assert(got.count() == 8000L - 21L)
    assert(got.where($"id".between(100L, 120L)).count() == 0L)
    // time travel still sees the pre-delete rows until vacuum
    assert(ManifestCommit.readAt(spark, dir, g1).count() == 8000L)
    // vacuum keeps the shared files (latest references them)
    ManifestCommit.vacuum(dir)
    assert(ManifestCommit.read(spark, dir).count() == 8000L - 21L)
  }

  test("upsertByKey rewrites only the files holding matched keys") {
    val dir = Files.createTempDirectory("cowup").toString
    val rows = (1L to 8000L).map(i => (i, i * 10)).toDF("id", "v")
    val g1 = ManifestCommit.writeVersioned(
      rows.repartitionByRange(8, $"id"), dir)
    val before = ManifestCommit.latest(dir).get._2.toSet
    // update 3 clustered keys + insert 2 new ones
    val incoming = Seq((100L, -1L), (101L, -2L), (102L, -3L),
      (9001L, -4L), (9002L, -5L)).toDF("id", "v")
    val g2 = ManifestCommit.upsertByKey(spark, incoming, "id", dir)
    assert(g2 > g1)
    val after = ManifestCommit.latest(dir).get._2.toSet
    assert(before.intersect(after).size == 7,
      s"expected 7 shared files, got ${before.intersect(after).size}")
    val got = ManifestCommit.read(spark, dir)
    assert(got.count() == 8002L)
    assert(got.where($"id" === 100L).select("v").as[Long].head() == -1L)
    assert(got.where($"id" === 9002L).select("v").as[Long].head() == -5L)
    assert(got.where($"id" === 200L).select("v").as[Long].head() == 2000L)
    // first write into an empty dataset degrades to writeVersioned
    val dir2 = Files.createTempDirectory("cowup2").toString
    ManifestCommit.upsertByKey(spark, incoming, "id", dir2)
    assert(ManifestCommit.read(spark, dir2).count() == 5L)
  }

  test("null-condition rows survive (SQL DELETE semantics); no-op returns gen") {
    val dir = Files.createTempDirectory("delw2").toString
    val rows = Seq((1L, Some(5L)), (2L, None), (3L, Some(50L)))
      .toDF("id", "v")
    val g1 = ManifestCommit.writeVersioned(rows.repartition(1), dir)
    // v > 10 is NULL for id=2 -> not deleted
    ManifestCommit.deleteWhere(spark, dir, col("v") > 10L)
    val left = ManifestCommit.read(spark, dir)
      .select("id").as[Long].collect().sorted.toSeq
    assert(left == Seq(1L, 2L))
    // nothing matches -> same generation back, no rewrite
    val g3 = ManifestCommit.latest(dir).get._1
    assert(ManifestCommit.deleteWhere(spark, dir, col("v") > 999L) == g3)
  }

  test("deleting every row of an affected file drops it from the manifest") {
    val dir = Files.createTempDirectory("delw3").toString
    val rows = (1L to 1000L).map(i => (i, i % 5)).toDF("id", "g")
    ManifestCommit.writeVersioned(rows.repartitionByRange(4, $"id"), dir)
    // wipe the whole first quartile: its file vanishes, none rewritten
    ManifestCommit.deleteWhere(spark, dir, col("id") <= 250L)
    val got = ManifestCommit.read(spark, dir)
    assert(got.count() == 750L)
    assert(got.agg(min($"id")).as[Long].head() == 251L)
  }
}
