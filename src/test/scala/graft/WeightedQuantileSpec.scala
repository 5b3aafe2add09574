package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.OrderStats

/** Round-7: weighted discrete quantiles — unit-weight degradation to
  * quantilesDisc, weight-mass targeting, tie merging, zero-weight
  * exclusion, group independence. */
class WeightedQuantileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def wq(rows: Seq[(String, Long, Long)], ps: Seq[Int]) =
    OrderStats.weightedQuantilesDisc(
      rows.toDF("g", "v", "w"), Seq("g"), "v", "w", ps)
      .select("g", "permille", "value").as[(String, Int, Long)]
      .collect().toSeq.sorted

  test("unit weights degrade exactly to quantilesDisc") {
    val rows = (1L to 8L).map(("a", _, 1L))
    val unw = OrderStats.quantilesDisc(
      rows.map(r => (r._1, r._2)).toDF("g", "v"), Seq("g"), "v",
      Seq(250, 500, 750))
      .select("g", "permille", "value").as[(String, Int, Long)]
      .collect().toSeq.sorted
    assert(wq(rows, Seq(250, 500, 750)) == unw)
  }

  test("weight mass moves the median: one heavy value dominates") {
    // v=10 carries 9 of 10 units → every quartile is 10
    val rows = Seq(("a", 10L, 9L), ("a", 99L, 1L))
    assert(wq(rows, Seq(250, 500, 750)).map(_._3) == Seq(10L, 10L, 10L))
    // target for 1000‰ is W itself → the last value
    assert(wq(rows, Seq(1000)).map(_._3) == Seq(99L))
  }

  test("duplicate values merge before the walk (a tie cannot split)") {
    // three (a,5) rows of weight 1 merge to weight 3; W=4 → median
    // target 2 lands inside the merged 5-run
    val rows = Seq(("a", 5L, 1L), ("a", 5L, 1L), ("a", 5L, 1L),
      ("a", 7L, 1L))
    assert(wq(rows, Seq(500)) == Seq(("a", 500, 5L)))
  }

  test("zero-weight values are never selected") {
    val rows = Seq(("a", 1L, 0L), ("a", 2L, 4L))
    assert(wq(rows, Seq(250, 500, 750, 1000)).map(_._3).forall(_ == 2L))
  }

  test("groups are independent") {
    val rows = Seq(("a", 1L, 1L), ("a", 2L, 1L),
      ("b", 100L, 3L), ("b", 200L, 1L))
    val byG = wq(rows, Seq(500)).map(r => r._1 -> r._3).toMap
    assert(byG == Map("a" -> 1L, "b" -> 100L))
  }
}
