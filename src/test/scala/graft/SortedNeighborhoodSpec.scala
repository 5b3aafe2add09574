package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.SortedNeighborhood

/** Round-6: sorted-neighborhood blocking — bucket-parallel global rank
  * equals a flat sort, window pairs cross bucket boundaries, null keys
  * drop, w=1 chains adjacents only.
  */
class SortedNeighborhoodSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // (id, key); bucket = key div 10.
  private def df(rows: Seq[(Long, Long)]) =
    rows.toDF("id", "k").selectExpr("id", "k", "k div 10 AS b")

  private def pairs(rows: Seq[(Long, Long)], w: Int) =
    SortedNeighborhood.candidatePairs(df(rows), "id", "b", Seq("k"), w)
      .as[(Long, Long, Long)].collect().sortBy(p => (p._1, p._2)).toSeq

  private def naive(rows: Seq[(Long, Long)], w: Int) = {
    val ranked = rows.sortBy { case (id, k) => (k, id) }.zipWithIndex
    (for {
      ((ia, _), ra) <- ranked; ((ib, _), rb) <- ranked
      if rb > ra && rb - ra <= w
    } yield (ia, ib, (rb - ra).toLong)).sortBy(p => (p._1, p._2)).toSeq
  }

  test("matches a flat global sort, including cross-bucket pairs") {
    // keys straddle bucket edges (9|10, 19|20) on purpose.
    val rows = Seq((1L, 5L), (2L, 9L), (3L, 10L), (4L, 11L), (5L, 19L),
      (6L, 20L), (7L, 35L))
    for (w <- Seq(1, 2, 3))
      assert(pairs(rows, w) == naive(rows, w), s"w=$w")
  }

  test("rank ties break by id, deterministically") {
    val rows = Seq((30L, 7L), (10L, 7L), (20L, 7L))
    assert(pairs(rows, 1) == Seq((10L, 20L, 1L), (20L, 30L, 1L)))
  }

  test("null keys drop instead of poisoning the order") {
    val rows = Seq((1L, Some(1L)), (2L, None), (3L, Some(2L)))
    val out = SortedNeighborhood.candidatePairs(
      rows.toDF("id", "k").selectExpr("id", "k", "k div 10 AS b"),
      "id", "b", Seq("k"), 1)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 3L, 1L)))
  }

  test("globalRank starts at 1 and is dense") {
    val ranks = SortedNeighborhood.globalRank(
      df(Seq((1L, 30L), (2L, 10L), (3L, 20L))), "id", "b", Seq("k"))
      .selectExpr("id", "__rank").as[(Long, Long)].collect().toMap
    assert(ranks == Map(2L -> 1L, 3L -> 2L, 1L -> 3L))
  }
}
