package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TimeWeighted

/** Round-5 wave 17: time-weighted step integral — holding-duration
  * weights, horizon close, exact decimal arithmetic.
  */
class TimeWeightedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, Double, Long, Long)], horizon: Long) =
    TimeWeighted.stepIntegral(
      rows.toDF("k", "v", "ts", "id")
        .withColumn("v", $"v".cast(DecimalType(28, 6))),
      Seq("k"), "ts", "v", "id", lit(horizon))
      .select($"k", $"integral".cast("double"), $"duration")
      .as[(Long, Double, Long)].collect().sortBy(_._1).toSeq

  test("values weight by holding time, last value holds to the horizon") {
    // k=1: v=10 for 5s, v=20 for 15s (to horizon 20) -> 50+300
    // k=2: single obs v=7 holds 0..horizon from ts=2 -> 7*18
    val got = run(Seq((1L, 10.0, 0L, 1L), (1L, 20.0, 5L, 2L),
      (2L, 7.0, 2L, 3L)), horizon = 20L)
    assert(got == Seq((1L, 350.0, 20L), (2L, 126.0, 18L)))
  }

  test("a per-sample mean would be wrong; the integral is not") {
    // v=100 held 1s, v=1 held 99s: per-sample mean 50.5, twap 1.99
    val got = run(Seq((1L, 100.0, 0L, 1L), (1L, 1.0, 1L, 2L)), 100L)
    val (_, integral, dur) = got.head
    assert(integral == 100.0 + 99.0 && dur == 100L)
    assert(math.abs(integral / dur - 1.99) < 1e-12)
  }

  test("same-timestamp observations are zero-width and deterministic") {
    val got = run(Seq((1L, 5.0, 10L, 2L), (1L, 9.0, 10L, 1L),
      (1L, 3.0, 15L, 3L)), 20L)
    // id=1 (v=9) precedes id=2 (v=5): 9 holds 0s, 5 holds 5s, 3 holds 5s
    assert(got == Seq((1L, 5.0 * 5 + 3.0 * 5, 10L)))
  }

  test("an observation after the horizon fails loudly") {
    intercept[Exception] {
      run(Seq((1L, 1.0, 30L, 1L)), horizon = 20L)
    }
  }

  test("integrals re-aggregate: day parts sum to the whole") {
    val obs = Seq((1L, 4.0, 0L, 1L), (1L, 6.0, 8L, 2L), (1L, 2.0, 13L, 3L))
    val whole = run(obs, 20L)
    // split at t=10 with the straddling value re-opened at the cut —
    // the composition a pre-divided mean cannot do
    val part1 = run(Seq((1L, 4.0, 0L, 1L), (1L, 6.0, 8L, 2L)), 10L)
    val part2 = run(Seq((1L, 6.0, 10L, 2L), (1L, 2.0, 13L, 3L)), 20L)
    assert(whole.head._2 == part1.head._2 + part2.head._2)
    assert(whole.head._3 == part1.head._3 + part2.head._3)
  }
}
