package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.IncrementalAgg
import graft.text.{Bpe, Sharding}

/** Round-5 wave 7: incremental aggregate maintenance, curriculum
  * interleave ordering, BPE pair counting.
  */
class IncrementalOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- IncrementalAgg -------------------------------------------------

  private lazy val rows = (1L to 300L).map { i =>
    (i % 7, i * 1.25 + (i % 11), i * 10)
  }.toDF("k", "v", "o")

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "n_rows", "total", "vmin", "vmax")
      .as[(Long, Long, java.math.BigDecimal, Long, Long)]
      .collect().sortBy(_._1).toSeq

  test("merge of a disjoint split equals the from-scratch state") {
    val whole = IncrementalAgg.state(rows, Seq("k"), "v", "o")
    for (cut <- Seq(1L, 150L, 300L)) {
      // cut=1: base holds nothing; cut=300: delta holds nothing for
      // some keys — both one-sided paths exercised
      val base = IncrementalAgg.state(
        rows.where($"o" < cut * 10), Seq("k"), "v", "o")
      val delta = IncrementalAgg.state(
        rows.where($"o" >= cut * 10), Seq("k"), "v", "o")
      val merged = IncrementalAgg.merge(base, delta, Seq("k"))
      assert(canon(merged) == canon(whole), s"cut=$cut")
    }
  }

  test("merge is associative across a three-way split") {
    val s1 = IncrementalAgg.state(rows.where($"o" < 1000), Seq("k"), "v", "o")
    val s2 = IncrementalAgg.state(
      rows.where($"o" >= 1000 && $"o" < 2000), Seq("k"), "v", "o")
    val s3 = IncrementalAgg.state(rows.where($"o" >= 2000), Seq("k"), "v", "o")
    val leftFold = IncrementalAgg.merge(
      IncrementalAgg.merge(s1, s2, Seq("k")), s3, Seq("k"))
    val rightFold = IncrementalAgg.merge(
      s1, IncrementalAgg.merge(s2, s3, Seq("k")), Seq("k"))
    val whole = IncrementalAgg.state(rows, Seq("k"), "v", "o")
    assert(canon(leftFold) == canon(whole))
    assert(canon(rightFold) == canon(whole))
  }

  test("keys exclusive to one side pass through unchanged") {
    val base = IncrementalAgg.state(
      Seq((1L, 2.0, 5L), (1L, 3.0, 7L)).toDF("k", "v", "o"),
      Seq("k"), "v", "o")
    val delta = IncrementalAgg.state(
      Seq((2L, 10.0, 1L)).toDF("k", "v", "o"), Seq("k"), "v", "o")
    val m = canon(IncrementalAgg.merge(base, delta, Seq("k")))
    assert(m == Seq(
      (1L, 2L, java.math.BigDecimal.valueOf(5000000L, 6), 5L, 7L),
      (2L, 1L, java.math.BigDecimal.valueOf(10000000L, 6), 1L, 1L)))
  }

  // ---- Sharding.curriculumInterleave ---------------------------------

  test("interleave_key is a round-robin total order over buckets") {
    val df = (1L to 120L).map(i => (i, (i % 4).toDouble / 4.0))
      .toDF("id", "score") // 4 equal buckets of 30 at scale 4
    val out = Sharding.curriculumInterleave(df, "id", "score", 4, "e1")
      .select("id", "difficulty_bucket", "rank_in_bucket", "interleave_key")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._4)
    // keys are unique (total order)
    assert(out.map(_._4).distinct.length == out.length)
    // the first |buckets| rows in key order are one row per bucket,
    // all rank 1; the next group is rank 2, and so on
    out.grouped(4).zipWithIndex.foreach { case (g, i) =>
      assert(g.map(_._2).toSet == Set(0L, 1L, 2L, 3L), s"group $i")
      assert(g.map(_._3).toSet == Set(i + 1L), s"group $i")
    }
  }

  test("a new salt yields a genuinely different within-bucket order") {
    val df = (1L to 200L).map(i => (i, 0.5)).toDF("id", "score")
    def order(salt: String) =
      Sharding.curriculumInterleave(df, "id", "score", 10, salt)
        .orderBy($"interleave_key").select("id").as[Long].collect().toSeq
    val (a, b) = (order("e1"), order("e2"))
    assert(a.toSet == b.toSet && a != b)
    // not a rotation of the same order either (the single-fold-hash
    // failure mode): adjacency must not be preserved
    val pairsA = a.zip(a.tail).toSet
    val sharedAdjacency = b.zip(b.tail).count(pairsA)
    assert(sharedAdjacency < a.length / 4,
      s"orders look like rotations: $sharedAdjacency shared adjacencies")
  }

  // ---- Bpe ------------------------------------------------------------

  test("pairCounts weights pairs by corpus token frequency") {
    val df = Seq("ab ab cd", "ab xyz").toDF("text")
    // tokens: ab x3, cd x1, xyz x1
    val got = Bpe.pairCounts(df, "text")
      .as[(String, Long)].collect().toMap
    assert(got == Map("ab" -> 3L, "cd" -> 1L, "xy" -> 1L, "yz" -> 1L))
  }

  test("repeated pairs inside one token count once per position") {
    val df = Seq("aaa").toDF("text") // positions 1-2 and 2-3 both 'aa'
    val got = Bpe.pairCounts(df, "text").as[(String, Long)].collect().toMap
    assert(got == Map("aa" -> 2L))
  }

  test("single-char tokens contribute nothing (sequence(1,0) guard)") {
    val df = Seq("a b c ab").toDF("text")
    val got = Bpe.pairCounts(df, "text").as[(String, Long)].collect().toMap
    assert(got == Map("ab" -> 1L))
  }

  test("mergeCandidates ranks count-desc with pair tie-break") {
    val df = Seq("aa aa bb bb cc").toDF("text")
    val got = Bpe.mergeCandidates(df, "text", k = 2)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("aa", 2L), ("bb", 2L)))
  }
}
