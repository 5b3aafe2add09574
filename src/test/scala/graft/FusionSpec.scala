package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sim.Fusion

/** Round-6: reciprocal-rank fusion — agreement beats a single first
  * place, single-run items score once, ties break by item, k caps. */
class FusionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Int)]) =
    rows.toDF("q", "item", "rank")

  test("an item ranked 2nd in both runs beats split first places") {
    // run A: x first, y second; run B: z first, y second.
    // y: 1/62+1/62 ≈ 0.0323 > x or z: 1/61 ≈ 0.0164.
    val a = run(Seq((1L, 10L, 1), (1L, 20L, 2)))
    val b = run(Seq((1L, 30L, 1), (1L, 20L, 2)))
    val out = Fusion.rrf(Seq(a, b), "q", "item", "rank", k = 3)
      .select("fused_rank", "item").as[(Int, Long)].collect().sorted.toSeq
    assert(out == Seq((1, 20L), (2, 10L), (3, 30L)))
  }

  test("equal scores tie-break by item id") {
    val a = run(Seq((1L, 7L, 1), (1L, 5L, 2)))
    val b = run(Seq((1L, 5L, 1), (1L, 7L, 2)))
    val out = Fusion.rrf(Seq(a, b), "q", "item", "rank", k = 2)
      .select("fused_rank", "item").as[(Int, Long)].collect().sorted.toSeq
    assert(out == Seq((1, 5L), (2, 7L)))
  }

  test("k caps the fused list per query, queries independent") {
    val a = run(Seq((1L, 1L, 1), (1L, 2L, 2), (1L, 3L, 3), (2L, 9L, 1)))
    val out = Fusion.rrf(Seq(a), "q", "item", "rank", k = 2)
      .select("q", "item").as[(Long, Long)].collect().sorted.toSeq
    assert(out == Seq((1L, 1L), (1L, 2L), (2L, 9L)))
  }

  test("rrf value is the quantized-term sum") {
    val a = run(Seq((1L, 5L, 1)))
    val b = run(Seq((1L, 5L, 3)))
    val got = Fusion.rrf(Seq(a, b), "q", "item", "rank", k = 1)
      .select("rrf").head().getDouble(0)
    val expected =
      (BigDecimal(1.0 / 61.0).setScale(9, BigDecimal.RoundingMode.HALF_UP) +
        BigDecimal(1.0 / 63.0).setScale(9, BigDecimal.RoundingMode.HALF_UP))
        .toDouble
    assert(got == expected)
  }
}
