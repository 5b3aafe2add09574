package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.Compressibility

/** Round-6: deflate-ratio quality signal — repetitive text scores far
  * below varied text, per-partition Deflater reuse is stateless across
  * rows, determinism, empty-doc convention. */
class CompressibilitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def score(rows: Seq[(Long, String)]) =
    Compressibility.deflateRatio(rows.toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(c => c.doc_id -> c).toMap

  test("boilerplate compresses far below varied text") {
    val repetitive = Seq.fill(200)("click here to subscribe now").mkString(" ")
    val varied = (1 to 200)
      .map(i => s"w${i * 7919 % 9973}x${i * 104729 % 31}").mkString(" ")
    val s = score(Seq(1L -> repetitive, 2L -> varied))
    assert(s(1L).ratio_permille < 100)
    assert(s(2L).ratio_permille > 3 * s(1L).ratio_permille)
  }

  test("Deflater reuse leaks no state: same text scores identically at any position") {
    val rows = Seq(1L -> "aaa bbb ccc ddd", 2L -> ("x" * 5000),
      3L -> "aaa bbb ccc ddd")
    val s = score(rows)
    assert(s(1L).n_deflated == s(3L).n_deflated)
    assert(s(1L).ratio_permille == s(3L).ratio_permille)
  }

  test("deterministic across runs; empty doc is 1000 by convention") {
    val rows = Seq(1L -> "some sample content here", 2L -> "")
    assert(score(rows).view.mapValues(_.n_deflated).toMap ==
      score(rows).view.mapValues(_.n_deflated).toMap)
    assert(score(rows)(2L).ratio_permille == 1000L)
    assert(score(rows)(2L).n_bytes == 0L)
  }
}
