package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Funnel

/** Round-6: rolling distinct actives — window membership, dedup
  * semantics, the observed-calendar contract. */
class RollingActivesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, Long)], w: Int = 7) =
    Funnel.rollingActives(rows.toDF("u", "d"), "u", "d", w)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap

  test("a user active once stays in the rolling window for w days") {
    // user 1 active day 0; days 0..3 observed via user 2
    val out = run(Seq(1L -> 0L, 2L -> 0L, 2L -> 1L, 2L -> 2L, 2L -> 3L),
      w = 3)
    assert(out(0L) == ((2L, 2L, 1000000L)))
    assert(out(1L) == ((1L, 2L, 500000L))) // user1 still within window
    assert(out(2L) == ((1L, 2L, 500000L)))
    assert(out(3L) == ((1L, 1L, 1000000L))) // user1 expired
  }

  test("duplicate events within a day count once") {
    val out = run(Seq(1L -> 0L, 1L -> 0L, 1L -> 0L), w = 7)
    assert(out(0L) == ((1L, 1L, 1000000L)))
  }

  test("only observed days appear (no ghost trailing days)") {
    val out = run(Seq(1L -> 0L), w = 7)
    assert(out.keySet == Set(0L))
  }

  test("rolling count never exceeds total distinct entities") {
    val out = run(Seq(1L -> 0L, 2L -> 1L, 3L -> 2L, 1L -> 2L), w = 7)
    assert(out(2L)._2 == 3L) // users 1,2,3 all within 7 days of day 2
    assert(out(2L)._1 == 2L) // dau day2: users 3 and 1
  }
}
