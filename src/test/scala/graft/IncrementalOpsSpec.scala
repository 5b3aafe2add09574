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

  // ---- Funnel ----------------------------------------------------------

  test("funnel only counts stages in order") {
    import graft.operators.Funnel
    val ev = Seq(
      // u1: clean view -> click -> purchase
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      // u2: purchase BEFORE the first view — stage 3 must not complete
      (2L, "purchase", 5L), (2L, "view", 10L), (2L, "click", 20L),
      // u3: click exists but precedes the first view — stalls at stage 1
      (3L, "click", 5L), (3L, "view", 10L), (3L, "purchase", 30L),
      // u4: early purchase ignored, later one after the click counts
      (4L, "view", 10L), (4L, "purchase", 15L), (4L, "click", 20L),
      (4L, "purchase", 40L),
      // u5: no stage-1 event at all
      (5L, "click", 10L), (5L, "purchase", 20L))
      .toDF("u", "et", "ts")
    val got = Funnel.funnel(ev, "u", "et", "ts",
      Seq("view", "click", "purchase"))
      .select("u", "t_1", "t_2", "t_3", "stages_completed")
      .as[(Long, Option[Long], Option[Long], Option[Long], Int)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) == ((Some(10L), Some(20L), Some(30L), 3)))
    assert(got(2L) == ((Some(10L), Some(20L), None, 2)))
    assert(got(3L) == ((Some(10L), None, None, 1)))
    assert(got(4L) == ((Some(10L), Some(20L), Some(40L), 3)))
    assert(got(5L) == ((None, None, None, 0)))
  }

  test("funnel accepts same-timestamp completion (>= semantics)") {
    import graft.operators.Funnel
    val ev = Seq((1L, "view", 10L), (1L, "click", 10L)).toDF("u", "et", "ts")
    val got = Funnel.funnel(ev, "u", "et", "ts", Seq("view", "click"))
      .select("t_1", "t_2").as[(Option[Long], Option[Long])].collect().head
    assert(got == ((Some(10L), Some(10L))))
  }

  test("funnel maxGap bounds each stage's distance from the previous one") {
    import graft.operators.Funnel
    val ev = Seq(
      // u1 clicks 5 after the view, u2 clicks 50 after — a gap of 10
      // keeps u1's click, rejects u2's even though it is in order
      (1L, "view", 10L), (1L, "click", 15L),
      (2L, "view", 10L), (2L, "click", 60L),
      // u3: an in-gap click exists later than an out-of-gap one
      (3L, "view", 10L), (3L, "click", 60L), (3L, "view", 55L),
      (3L, "click", 58L))
      .toDF("u", "et", "ts")
    val got = Funnel.funnel(ev, "u", "et", "ts", Seq("view", "click"),
      maxGap = Some(10L))
      .select("u", "t_2").as[(Long, Option[Long])].collect().toMap
    assert(got(1L) == Some(15L))
    assert(got(2L) == None)
    // u3: first view is 10; click 58 is out of its gap BUT within the
    // 55-view's — the operator gates on the FIRST stage-1 time only
    // (t_1 = 10), so neither click lands in [10, 20]
    assert(got(3L) == None)
  }

  test("retention builds the cohort triangle, same-day dedup included") {
    import graft.operators.Funnel
    val ev = Seq(
      (1L, 0L), (1L, 0L), (1L, 1L), (1L, 3L), // cohort 0; dup day 0 row
      (2L, 0L), (2L, 3L),                     // cohort 0
      (3L, 1L), (3L, 2L))                     // cohort 1
      .toDF("u", "day")
    val got = Funnel.retention(ev, "u", "day")
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == Map(
      (0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 3L) -> 2L,
      (1L, 0L) -> 1L, (1L, 1L) -> 1L))
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

  test("pairCounts pairs are CODE POINTS on multibyte tokens (pinned contract)") {
    // the pair unit is the Unicode code point, NOT the byte and NOT the
    // grapheme cluster: 'é' composed (U+00E9) is one symbol; 'e'+combining
    // acute (U+0065 U+0301) is two. DuckDB 1.x substr/length agree with
    // this, which is what keeps the q109 oracle comparable cross-engine.
    val composed = "café"          // 4 code points: c a f é
    val decomposed = "café"       // 5 code points: c a f e ´
    val cjk = "日本語"      // 日本語, 3 code points
    val df = Seq(s"$composed $decomposed $cjk").toDF("text")
    val got = Bpe.pairCounts(df, "text").as[(String, Long)].collect().toMap
    assert(got == Map(
      "ca" -> 2L, "af" -> 2L,
      "fé" -> 1L,                  // composed pair
      "fe" -> 1L, "é" -> 1L,      // decomposed splits into two pairs
      "日本" -> 1L, "本語" -> 1L))
  }
}
