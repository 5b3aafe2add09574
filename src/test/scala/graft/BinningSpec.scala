package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.OrderStats

/** Round-6: equal-frequency binning — boundary membership (lower bin on
  * ties), tied boundaries collapsing, group independence. */
class BinningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def bins(rows: Seq[(String, Long)], ps: Seq[Int]) =
    OrderStats.equalFrequencyBins(rows.toDF("g", "v"), Seq("g"), "v", ps)
      .select("g", "v", "bin").as[(String, Long, Long)]
      .collect().toSeq.sorted

  test("quartiles of 1..8: boundaries 2,4,6; boundary values bin low") {
    // n=8: ranks ceil(p*8/1000) for 250/500/750 = 2,4,6 → values 2,4,6.
    val rows = (1L to 8L).map(("a", _))
    val out = bins(rows, Seq(250, 500, 750)).map(r => r._2 -> r._3).toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 2L,
      6L -> 2L, 7L -> 3L, 8L -> 3L))
  }

  test("tied boundaries collapse bins deterministically") {
    // all values equal → all boundaries equal → every row bin 0.
    val rows = Seq.fill(6)(("a", 7L))
    assert(bins(rows, Seq(250, 500, 750)).forall(_._3 == 0L))
  }

  private def norm(rows: Seq[(String, Long)]) =
    OrderStats.rankNormalize(rows.toDF("g", "v"), Seq("g"), "v")
      .select("g", "v", "permille").as[(String, Long, Long)]
      .collect().toSeq.sorted

  test("rankNormalize: endpoints 0 and 1000, ties share a permille") {
    val out = norm(Seq(("a", 10L), ("a", 20L), ("a", 20L), ("a", 30L),
      ("a", 40L)))
    // ranks: 10→1, 20→2, 20→2, 30→4, 40→5; n=5 → (r-1)*1000 div 4
    assert(out.map(r => r._2 -> r._3).distinct.sorted ==
      Seq(10L -> 0L, 20L -> 250L, 30L -> 750L, 40L -> 1000L))
  }

  test("rankNormalize: a singleton group maps to 0") {
    assert(norm(Seq(("a", 99L))) == Seq(("a", 99L, 0L)))
  }

  test("groups bin independently") {
    val rows = (1L to 4L).map(("a", _)) ++ (101L to 104L).map(("b", _))
    val out = bins(rows, Seq(500))
    assert(out.filter(_._1 == "a").map(r => r._2 -> r._3).toMap ==
      Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L))
    assert(out.filter(_._1 == "b").map(r => r._2 -> r._3).toMap ==
      Map(101L -> 0L, 102L -> 0L, 103L -> 1L, 104L -> 1L))
  }
}
