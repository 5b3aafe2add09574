package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.HeavyHitters

/** Round-5 wave 16: Misra–Gries heavy hitters — candidate completeness
  * and exactness of the verified output.
  */
class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // zipf-ish: item i appears 3000/i times, i in 1..60 → n ≈ 14,000
  private lazy val skewed = (1 to 60).flatMap(i =>
    Seq.fill(3000 / i)(s"item$i")).toDF("x").repartition(8)

  private def exact(num: Long, den: Long) = {
    val n = skewed.count()
    skewed.groupBy("x").count()
      .where($"count" * den >= lit(n) * num)
      .as[(String, Long)].collect().sortBy(_._1).toSeq
  }

  test("frequentItems returns exactly the items above the fraction") {
    for ((num, den) <- Seq((1L, 100L), (5L, 100L), (1L, 20L))) {
      val got = HeavyHitters.frequentItems(skewed, "x", num, den, k = 255)
        .as[(String, Long)].collect().sortBy(_._1).toSeq
      assert(got == exact(num, den), s"threshold $num/$den")
    }
  }

  test("tiny k still complete while (k+1)*num > den holds") {
    // k=39, threshold 1/20: (40)*1 > 20 — the bound holds with room
    val got = HeavyHitters.frequentItems(skewed, "x", 1L, 20L, k = 39)
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    assert(got == exact(1L, 20L))
  }

  test("a threshold below the MG guarantee refuses loudly") {
    assertThrows[IllegalArgumentException] {
      HeavyHitters.frequentItems(skewed, "x", 1L, 1000L, k = 255)
    }
  }

  test("null items are excluded, not counted into n") {
    val withNulls = skewed.unionByName(
      Seq.fill(5000)(Option.empty[String]).toDF("x"))
    val got = HeavyHitters.frequentItems(withNulls, "x", 1L, 20L, k = 255)
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    assert(got == exact(1L, 20L), "nulls must not dilute the threshold")
  }

  test("the MG kernel holds at most k counters and keeps every > n/(k+1) item") {
    val rnd = new scala.util.Random(3)
    val stream = rnd.shuffle(
      (1 to 50).flatMap(i => Seq.fill(2000 / i)(s"i$i")).toVector)
    val k = 15
    val out = HeavyHitters.misraGries(stream.iterator, k).toSet
    assert(out.size <= k, s"${out.size} counters survived, k=$k")
    val n = stream.size
    val counts = stream.groupBy(identity).view.mapValues(_.size)
    counts.filter { case (_, c) => c > n / (k + 1) }.keys.foreach { hh =>
      assert(out.contains(hh), s"MG lost heavy hitter $hh")
    }
  }
}
