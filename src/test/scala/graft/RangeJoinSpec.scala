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
