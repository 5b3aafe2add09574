package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skyline

/** Round-5 wave 14: 2-D Pareto front — domination semantics, duplicate
  * frontier points, and the two-prune distributed path vs the naive
  * quadratic answer.
  */
class SkylineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pts(df: DataFrame) =
    df.select("x", "y").as[(Long, Long)].collect().sorted.toSeq

  test("keeps exactly the non-dominated points") {
    val t = Seq((1L, 9L), (3L, 7L), (5L, 5L), (4L, 4L), (2L, 8L), (5L, 2L))
      .toDF("x", "y")
    // (4,4) < (5,5); (5,2) shares x=5 with higher y; (2,8) < ... no:
    // (2,8) vs (3,7)? neither dominates. Front: (1,9),(2,8),(3,7),(5,5)
    assert(pts(Skyline.paretoFront(t, "x", "y")) ==
      Seq((1L, 9L), (2L, 8L), (3L, 7L), (5L, 5L)))
  }

  test("equal-x ties: only the max y at that x survives") {
    val t = Seq((5L, 5L), (5L, 4L), (3L, 6L)).toDF("x", "y")
    assert(pts(Skyline.paretoFront(t, "x", "y")) ==
      Seq((3L, 6L), (5L, 5L)))
  }

  test("duplicate frontier points are all kept (neither dominates)") {
    val t = Seq((5L, 5L), (5L, 5L), (1L, 9L)).toDF("x", "y")
    assert(pts(Skyline.paretoFront(t, "x", "y")) ==
      Seq((1L, 9L), (5L, 5L), (5L, 5L)))
  }

  test("null coordinates are dropped, not enthroned") {
    val t = Seq((Some(5L), Some(5L)), (None, Some(99L)), (Some(99L), None))
      .toDF("x", "y")
    assert(pts(Skyline.paretoFront(t, "x", "y")) == Seq((5L, 5L)))
  }

  test("two-prune distributed front equals the naive quadratic answer") {
    val rnd = new scala.util.Random(7)
    val t = Seq.fill(400)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .toDF("x", "y").repartition(13)
    val a = t.as("a")
    val dominated = a.join(t.as("b"),
      (col("b.x") >= col("a.x")) && (col("b.y") >= col("a.y")) &&
        ((col("b.x") > col("a.x")) || (col("b.y") > col("a.y"))),
      "left_semi")
    val naive = pts(t.exceptAll(dominated))
    assert(pts(Skyline.paretoFront(t, "x", "y")) == naive)
  }

  test("fractional axes dominate correctly (no integer-spacing assumption)") {
    // (1.0, 5.0) is dominated by (1.5, 10.0) — a range-frame
    // formulation with an integer offset would miss the dominator in
    // the open interval (x, x+1)
    val t = Seq((1.0, 5.0), (1.5, 10.0), (0.2, 11.0)).toDF("x", "y")
    val got = Skyline.paretoFront(t, "x", "y")
      .select("x", "y").as[(Double, Double)].collect().sorted.toSeq
    assert(got == Seq((0.2, 11.0), (1.5, 10.0)))
  }

  test("a minimize axis is its negation: most y for least x") {
    val t = Seq((2L, 10L), (4L, 11L), (3L, 9L), (2L, 7L)).toDF("x", "y")
    val got = Skyline.paretoFront(
      t.withColumn("negx", -col("x")), "negx", "y")
      .select("x", "y").as[(Long, Long)].collect().sorted.toSeq
    // (3,9) loses to (2,10): more chars, fewer tokens; (2,7) to (2,10)
    assert(got == Seq((2L, 10L), (4L, 11L)))
  }
}
