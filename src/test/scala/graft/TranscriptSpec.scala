package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.Transcript

/** Round-6: transcript assembly — offsets reconstruct the joined
  * transcript exactly, trailing-k keeps the newest, tie determinism. */
class TranscriptSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Long, String, String)], k: Int) =
    Transcript.turns(
      rows.toDF("conv", "ts", "tie", "r", "c"),
      "conv", "ts", "tie", col("r"), col("c"), k)
      .as[(Long, Long, String, String, Long, Long)]
      .collect().sortBy(t => (t._1, t._2)).toSeq

  test("offsets index the rendered transcript exactly") {
    val rows = Seq(
      (1L, 10L, 1L, "user", "hello there"),
      (1L, 20L, 2L, "assistant", "hi"),
      (1L, 30L, 3L, "user", "bye"))
    val out = run(rows, 5)
    val transcript = out.map(t => s"<${t._3}>${t._4}").mkString("\n")
    out.foreach { t =>
      assert(transcript.substring(t._5.toInt, t._6.toInt) ==
        s"<${t._3}>${t._4}")
    }
    assert(out.map(_._2) == Seq(1L, 2L, 3L))
    assert(out.head._5 == 0L)
  }

  test("trailing-k truncation drops the OLDEST turns and reindexes") {
    val rows = (1L to 7L).map(i => (1L, i * 10L, i, "user", s"m$i"))
    val out = run(rows, 3)
    assert(out.map(_._4) == Seq("m5", "m6", "m7"))
    assert(out.map(_._2) == Seq(1L, 2L, 3L))
    assert(out.head._5 == 0L) // offsets restart for the truncated window
  }

  test("same-timestamp turns order by the tie column") {
    val rows = Seq((1L, 10L, 2L, "user", "second"),
      (1L, 10L, 1L, "user", "first"))
    assert(run(rows, 5).map(_._4) == Seq("first", "second"))
  }

  test("conversations are independent") {
    val rows = Seq((1L, 10L, 1L, "user", "a"), (2L, 5L, 1L, "user", "bb"))
    val out = run(rows, 5)
    assert(out.forall(_._5 == 0L))
  }
}
