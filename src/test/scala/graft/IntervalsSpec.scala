package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Intervals

/** Round-5 wave 12: interval merge (gaps-and-islands over true
  * intervals) and the uncovered-holes complement.
  */
class IntervalsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def spans(df: DataFrame) =
    df.select("k", "span_start", "span_end", "n_intervals")
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq

  test("overlapping and touching intervals merge; disjoint ones do not") {
    val iv = Seq(
      (1L, 0L, 10L), (1L, 5L, 20L),   // overlap
      (1L, 20L, 25L),                 // touching endpoint merges (closed)
      (1L, 30L, 40L),                 // disjoint
      (2L, 0L, 3L))                   // other key untouched
      .toDF("k", "s", "e")
    assert(spans(Intervals.mergeOverlapping(iv, Seq("k"), "s", "e")) == Seq(
      (1L, 0L, 25L, 3L), (1L, 30L, 40L, 1L), (2L, 0L, 3L, 1L)))
  }

  test("a long interval swallows later short ones (running max, not lag)") {
    // the lag-on-start bug: [0,100] then [10,20] then [30,40] — with
    // lag(e) the third row would compare s=30 against e=20 and wrongly
    // open a new island inside the covering interval
    val iv = Seq((1L, 0L, 100L), (1L, 10L, 20L), (1L, 30L, 40L),
      (1L, 150L, 160L)).toDF("k", "s", "e")
    assert(spans(Intervals.mergeOverlapping(iv, Seq("k"), "s", "e")) == Seq(
      (1L, 0L, 100L, 3L), (1L, 150L, 160L, 1L)))
  }

  test("maxGap bridges separations up to the gap, not beyond") {
    val iv = Seq((1L, 0L, 10L), (1L, 15L, 20L), (1L, 31L, 40L))
      .toDF("k", "s", "e")
    assert(spans(Intervals.mergeOverlapping(iv, Seq("k"), "s", "e",
      maxGap = 5L)) == Seq((1L, 0L, 20L, 2L), (1L, 31L, 40L, 1L)))
    assert(spans(Intervals.mergeOverlapping(iv, Seq("k"), "s", "e",
      maxGap = 11L)) == Seq((1L, 0L, 40L, 3L)))
  }

  test("empty intervals (s > e) are dropped") {
    val iv = Seq((1L, 10L, 5L), (1L, 0L, 3L)).toDF("k", "s", "e")
    assert(spans(Intervals.mergeOverlapping(iv, Seq("k"), "s", "e")) ==
      Seq((1L, 0L, 3L, 1L)))
  }

  test("gaps returns exactly the uncovered holes between spans") {
    val iv = Seq((1L, 0L, 10L), (1L, 20L, 30L), (1L, 31L, 35L),
      (1L, 50L, 60L), (2L, 0L, 5L)).toDF("k", "s", "e")
    val got = Intervals.gaps(iv, Seq("k"), "s", "e")
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    // [20,30] and [31,35] touch under closed semantics +1: 31 = 30+1 —
    // adjacent integers leave no integer hole, so no gap between them
    assert(got == Seq((1L, 10L, 20L), (1L, 35L, 50L)))
  }

  test("merge plans one exchange: both windows and the agg share it") {
    val iv = Seq((1L, 0L, 10L)).toDF("k", "s", "e")
    val plan = Intervals.mergeOverlapping(iv, Seq("k"), "s", "e")
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 == 1, s"extra exchange:\n$plan")
  }
}
