package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Basket

/** Round-6: market-basket frequent pairs — A-priori prune semantics,
  * presence (not multiplicity) counting, exact scaled-integer lift. */
class BasketSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pairs(rows: Seq[(Int, String)], minItem: Long, minPair: Long) =
    Basket.frequentPairs(rows.toDF("b", "i"), "b", "i", minItem, minPair)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap

  test("pair support counts baskets containing both items") {
    // x,y together in baskets 1 and 2; x,z only in basket 1
    val out = pairs(Seq(
      1 -> "x", 1 -> "y", 1 -> "z",
      2 -> "x", 2 -> "y",
      3 -> "z"), minItem = 1, minPair = 2)
    assert(out.keySet == Set(("x", "y")))
    val (ps, sa, sb, _) = out(("x", "y"))
    assert(ps == 2L && sa == 2L && sb == 2L)
  }

  test("duplicate (basket, item) rows count once — presence semantics") {
    val out = pairs(Seq(
      1 -> "x", 1 -> "x", 1 -> "y", 1 -> "y"), minItem = 1, minPair = 1)
    assert(out(("x", "y")) == ((1L, 1L, 1L, 1000000L)))
  }

  test("A-priori prune: an infrequent item never reaches pairing") {
    // z appears in 1 basket; with minItemSupport=2 no z-pair survives
    // even though (y, z) co-occur once and minPairSupport=1
    val out = pairs(Seq(
      1 -> "x", 1 -> "y", 1 -> "z",
      2 -> "x", 2 -> "y"), minItem = 2, minPair = 1)
    assert(out.keySet == Set(("x", "y")))
  }

  test("lift_ppm is the exact floored scaled integer") {
    // 4 baskets; x in {1,2,3} (supp 3), y in {1,2,4} (supp 3),
    // together in {1,2} → lift = 4*2/(3*3) = 8/9 → ⌊8e6/9⌋ = 888888
    val out = pairs(Seq(
      1 -> "x", 1 -> "y",
      2 -> "x", 2 -> "y",
      3 -> "x", 4 -> "y"), minItem = 1, minPair = 1)
    assert(out(("x", "y")) == ((2L, 3L, 3L, 888888L)))
  }

  test("item_a < item_b orientation — each pair emitted once") {
    val df = Basket.frequentPairs(
      Seq(1 -> "b", 1 -> "a").toDF("b", "i"), "b", "i", 1, 1)
    val rows = df.collect()
    assert(rows.length == 1)
    assert(rows.head.getString(0) == "a" && rows.head.getString(1) == "b")
  }

  test("null basket or item rows are dropped") {
    val df = Seq((Some(1), Some("x")), (Some(1), None), (None, Some("y")))
      .toDF("b", "i")
    val out = Basket.frequentPairs(df, "b", "i", 1, 1).collect()
    assert(out.isEmpty) // only one live (basket, item) row -> no pairs
  }
}
