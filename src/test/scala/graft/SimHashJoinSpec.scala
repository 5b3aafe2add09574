package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.Dedup

/** Round-6: SimHash Hamming join — pigeonhole completeness vs the
  * naive all-pairs answer, identical-text zero distance, threshold
  * behavior at both supported band splits. */
class SimHashJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs: Seq[(Long, String)] = Seq(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "the quick brown fox jumps over the lazy dog",  // identical to 1
    3L -> "the quick brown fox jumps over the lazy cat",  // near 1
    4L -> "completely different content about spark joins",
    5L -> "completely different content about spark joins and more",
    6L -> "unrelated third topic entirely separate words here")

  private def naive(maxDist: Int): Set[(Long, Long, Long)] = {
    val sigs = docs.toDF("id", "text")
      .select(col("id"), Dedup.simHash(col("text")).as("s"))
      .as[(Long, Long)].collect().toMap
    (for {
      a <- docs.map(_._1); b <- docs.map(_._1) if a < b
      h = java.lang.Long.bitCount(sigs(a) ^ sigs(b)).toLong
      if h <= maxDist
    } yield (a, b, h)).toSet
  }

  private def banded(maxDist: Int): Set[(Long, Long, Long)] =
    Dedup.simHashHammingPairs(docs.toDF("id", "text"), "id", "text", maxDist)
      .as[(Long, Long, Long)].collect().toSet

  test("identical text is Hamming 0 and always found") {
    assert(banded(1).contains((1L, 2L, 0L)))
  }

  test("banded join equals naive all-pairs at maxDist 1 and 3") {
    for (d <- Seq(1, 3)) assert(banded(d) == naive(d), s"maxDist=$d")
  }

  test("maxDist+1 must divide the signature width") {
    intercept[IllegalArgumentException] {
      Dedup.simHashHammingPairs(docs.toDF("id", "text"), "id", "text", 2)
    }
  }
}
