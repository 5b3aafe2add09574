package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TimeDecay

/** Round-6: time-decayed aggregates — half-life semantics, reference
  * anchoring at the max timestamp, null-value contract. */
class TimeDecaySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val H = 3600000000000L // ns per hour

  private def agg(rows: Seq[(String, Long, java.lang.Double)]) =
    TimeDecay.decayedAgg(rows.toDF("k", "ts", "value"), Seq("k"),
        "ts", "value", halfLifeHours = 24)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap

  test("the newest event weighs 1; one half-life ago weighs 1/2") {
    val now = 100L * H
    val out = agg(Seq(("a", now, 2.0), ("a", now - 24 * H, 2.0)))("a")
    assert(out._1 == 2L)
    assert(math.abs(out._2 - 1.5) < 1e-6)      // 1 + 0.5
    assert(math.abs(out._3 - 3.0) < 1e-6)      // 2 + 1
  }

  test("sub-hour ages floor to zero: full weight") {
    val now = 100L * H
    val out = agg(Seq(("a", now, 1.0), ("a", now - H / 2, 1.0)))("a")
    assert(math.abs(out._2 - 2.0) < 1e-9)
  }

  test("null value counts toward n and decayed_count only") {
    val now = 100L * H
    val out = agg(Seq(("a", now, 4.0), ("a", now, null)))("a")
    assert(out._1 == 2L)
    assert(math.abs(out._2 - 2.0) < 1e-9)
    assert(math.abs(out._3 - 4.0) < 1e-6)
  }
}
