package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.OrderStats

/** Round-6: winsorized stats — exact order-stat clip bounds, clip
  * counts, and the pinned-divide mean. */
class WinsorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(String, Long)], lo: Int, hi: Int) =
    OrderStats.winsorizedStats(rows.toDF("g", "v"), Seq("g"), "v", lo, hi)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getAs[Double]("winsor_mean")))
      .toMap

  test("outlier clips to the p90 order statistic") {
    // 1..9 plus 100: lo rank ceil(.1*10)=1 -> 1, hi rank ceil(.9*10)=9 -> 9
    // clipped mean = (1+...+9 + 9)/10 = 5.4
    val out = run((1L to 9L).map(("a", _)) :+ (("a", 100L)), 100, 900)
    assert(out("a") == ((10L, 1L, 9L, 0L, 1L, 5.4)))
  }

  test("no clipping when bounds span the data") {
    val out = run(Seq(("a", 2L), ("a", 4L)), 1, 1000)
    // lo rank ceil(.001*2)=1 -> 2; hi rank ceil(2)=2 -> 4; mean 3.0
    assert(out("a") == ((2L, 2L, 4L, 0L, 0L, 3.0)))
  }

  test("both sides clip, counts split correctly") {
    // values 0,5,5,5,100; p200 -> rank 1 (0), p800 -> rank 4 (5)
    val out = run(Seq(("a", 0L), ("a", 5L), ("a", 5L), ("a", 5L),
      ("a", 100L)), 200, 800)
    val (n, lo, hi, cl, ch, m) = out("a")
    assert(n == 5L && lo == 0L && hi == 5L && cl == 0L && ch == 1L)
    assert(m == (0 + 5 + 5 + 5 + 5) / 5.0)
  }

  test("groups are independent and nulls drop") {
    val df = Seq(("a", Some(1L)), ("a", Some(3L)), ("b", Some(10L)),
      ("b", None)).toDF("g", "v")
    val out = OrderStats.winsorizedStats(df, Seq("g"), "v", 100, 900)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 2L, "b" -> 1L))
  }
}
