package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** The bucketed interval join must be EXACTLY the naive BETWEEN join —
  * for any bucket width, across bucket boundaries, at inclusive ends,
  * and for negative coordinates (where truncating division would
  * misbucket). The plan claim: an equi-join on the bucket id, never a
  * BroadcastNestedLoopJoin.
  */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // deterministic fixture: points on both sides of zero, intervals of
  // mixed lengths including empty (s > e), point-sized (s == e), and
  // multi-bucket spans
  private lazy val facts = {
    import spark.implicits._
    (-50 to 50).map(i => (i.toLong, (i * 7 % 101).toLong)).toDF("fid", "t")
  }
  private lazy val intervals = {
    import spark.implicits._
    Seq(
      (1L, -40L, -30L), (2L, -5L, 5L), (3L, 0L, 0L), (4L, 10L, 9L),
      (5L, -100L, 100L), (6L, 37L, 37L), (7L, 90L, 150L), (8L, -3L, 21L)
    ).toDF("iid", "s", "e")
  }

  private def naive = facts.crossJoin(intervals)
    .where(col("t") >= col("s") && col("t") <= col("e"))
    .select("fid", "t", "iid", "s", "e")
    .collect().map(_.toSeq).toSet

  test("matches the naive BETWEEN join for widths 1, 7, 64, 10000") {
    for (w <- Seq(1L, 7L, 64L, 10000L)) {
      val got = RangeJoin.intervalJoin(facts, "t", intervals, "s", "e", w)
        .select("fid", "t", "iid", "s", "e")
        .collect().map(_.toSeq).toSet
      assert(got === naive, s"width $w diverged from naive join")
    }
  }

  test("plans as an equi-join, not BroadcastNestedLoopJoin") {
    val plan = RangeJoin
      .intervalJoin(facts, "t", intervals, "s", "e", 16L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ in plan:\n$plan")
  }

  private lazy val leftIv = {
    import spark.implicits._
    Seq((1L, -30L, -10L), (2L, -5L, 5L), (3L, 0L, 0L), (4L, 9L, 8L),
      (5L, -100L, 100L), (6L, 40L, 80L), (7L, 80L, 90L))
      .toDF("lid", "ls", "le")
  }
  private lazy val rightIv = {
    import spark.implicits._
    Seq((11L, -12L, -11L), (12L, 5L, 9L), (13L, 0L, 0L), (14L, 3L, 2L),
      (15L, 90L, 200L), (16L, -40L, -35L), (17L, 60L, 61L))
      .toDF("rid", "rs", "re")
  }

  test("overlapJoin matches the naive overlap join, each pair exactly once") {
    // empty intervals (s > e) are non-entities on both sides: the naive
    // closed-interval formula would spuriously "overlap" them
    val naive = leftIv.crossJoin(rightIv)
      .where(col("ls") <= col("le") && col("rs") <= col("re") &&
        col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lid", "rid").collect().map(_.toSeq).toSeq.sorted(
        Ordering.by((s: Seq[Any]) => (s(0).asInstanceOf[Long], s(1).asInstanceOf[Long])))
    for (w <- Seq(1L, 7L, 64L, 10000L)) {
      val got = RangeJoin
        .overlapJoin(leftIv, "ls", "le", rightIv, "rs", "re", w)
        .select("lid", "rid").collect().map(_.toSeq).toSeq.sorted(
          Ordering.by((s: Seq[Any]) => (s(0).asInstanceOf[Long], s(1).asInstanceOf[Long])))
      assert(got === naive, s"width $w diverged (duplicates or misses)")
    }
    // touching endpoints overlap (closed intervals): (2,[-5,5]) vs (12,[5,9])
    assert(naive.contains(Seq(2L, 12L)))
  }

  test("floorDiv is exact above 2^53 (epoch-nanosecond coordinates)") {
    // doubles hold integers exactly only below 2^53 ≈ 9.0e15. A
    // double-routed division (Column `/` = Divide) misrounds
    // ns-magnitude bucket labels — 2026-01-01T00:00Z in ns at width
    // 3600000001 computes one bucket off the true floor. Pin
    // floorDiv == BigInt floor division across magnitudes (> 2^53,
    // negatives, zero) and odd widths, including the known-misrounding
    // coordinates.
    import spark.implicits._
    val base = 1767225600L * 1000000000L // 2026-01-01 in ns ≈ 1.77e18
    val coords = Seq(base, base - 1L, base + 1L, base + 999999999L,
      -base, -base - 1L, 1767225600000093312L, 1767225600000000007L,
      Long.MaxValue / 2, 0L, -1L, 12345L)
    val widths = Seq(7L, 999L, 1000000007L, 3600000001L)
    val df = coords.map(Tuple1(_)).toDF("c")
    for (w <- widths) {
      val got = df.select(col("c"), RangeJoin.floorDiv(col("c"), w).as("b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      for (c <- coords) {
        val expected = (BigInt(c) - (((BigInt(c) % w) + w) % w)) / w
        assert(BigInt(got(c)) === expected,
          s"floorDiv($c, $w) = ${got(c)}, want $expected")
      }
    }
  }

  test("ns-magnitude coordinates: join still matches the naive join") {
    import spark.implicits._
    val base = 1767225600L * 1000000000L
    val pts = Seq(base - 1L, base, base + 1L, base + 999999999L,
      base + 3600000001L).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("fid", "t")
    val ivs = Seq(
      (1L, base - 3600000001L, base - 1L), // ends at a bucket edge
      (2L, base, base + 3600000000L), // exactly one odd-width bucket
      (3L, base - 5L, base + 5L) // straddles the edge
    ).toDF("iid", "s", "e")
    val naive = pts.crossJoin(ivs)
      .where(col("t") >= col("s") && col("t") <= col("e"))
      .select("fid", "iid").collect().map(_.toSeq).toSet
    val got = RangeJoin.intervalJoin(pts, "t", ivs, "s", "e", 3600000001L)
      .select("fid", "iid").collect().map(_.toSeq).toSet
    assert(got === naive, "ns-scale coordinates misbucketed")
    assert(naive.contains(Seq(0L, 1L)) && naive.contains(Seq(1L, 2L)) &&
      naive.contains(Seq(0L, 3L)) && naive.contains(Seq(1L, 3L)))
  }

  test("rejects overlapping column names and non-positive widths") {
    intercept[IllegalArgumentException] {
      RangeJoin.intervalJoin(facts, "t", intervals.withColumnRenamed("s", "t"),
        "t", "e", 8L)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.intervalJoin(facts, "t", intervals, "s", "e", 0L)
    }
  }
}
