package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Intervals

/** Round-6: interval concurrency profile — stabbing counts vs a naive
  * reference, bucket-edge membership, empty-gap buckets, empty input. */
class ConcurrencySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def prof(iv: Seq[(Long, Long)], w: Long) =
    Intervals.concurrencyProfile(iv.toDF("s", "e"), "s", "e", w)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq

  private def naive(iv: Seq[(Long, Long)], w: Long) = {
    val b = iv.filter(p => p._1 <= p._2)
      .map { case (s, e) => (Math.floorDiv(s, w), Math.floorDiv(e, w)) }
    if (b.isEmpty) Seq.empty
    else {
      val lo = b.map(_._1).min; val hi = b.map(_._2).max
      (lo to hi).map { k =>
        (k, b.count(_._1 == k).toLong, b.count(_._2 == k).toLong,
          b.count(p => p._1 <= k && k <= p._2).toLong)
      }
    }
  }

  test("matches the naive stabbing count, including empty middle buckets") {
    val iv = Seq((0L, 25L), (5L, 9L), (40L, 45L), (41L, 44L), (90L, 95L))
    assert(prof(iv, 10L) == naive(iv, 10L))
  }

  test("an interval spanning many buckets is active in each") {
    val out = prof(Seq((0L, 39L)), 10L)
    assert(out.map(_._4) == Seq(1L, 1L, 1L, 1L))
    assert(out.head._2 == 1L && out.last._3 == 1L)
  }

  test("inverted intervals drop; empty input yields an empty profile") {
    assert(prof(Seq((10L, 5L)), 10L).isEmpty)
    assert(prof(Seq.empty, 10L).isEmpty)
  }
}
