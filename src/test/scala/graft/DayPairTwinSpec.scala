package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.{RobustScaleQueries, RobustTrendQueries}

/** The size-gated single-task day² twins behind q846/q847/q848 (Sn,
  * Qn, Hodges-Lehmann) and q647 (Siegel repeated medians): forcing
  * cap = 0 runs the original relational all-pairs plan on the same
  * series, so both branches are asserted BIT-identical — including
  * tie values (duplicate x) and irregular day spacing. */
class DayPairTwinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 7 days, duplicate values (two 300s) so rank tie-breaks are hit
  private def day = Seq(
    ("1995-01-01", 500L), ("1995-01-02", 300L), ("1995-01-03", 900L),
    ("1995-01-04", 300L), ("1995-01-05", 1200L), ("1995-01-06", 700L),
    ("1995-01-07", 100L))
    .toDF("ds", "x")
    .select(col("ds").cast("date").as("d"), col("x"))

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("snFrame: single-task twin ≡ relational plan") {
    assert(rows(RobustScaleQueries.snFrame(day)) ==
      rows(RobustScaleQueries.snFrame(day, cap = 0L)))
  }

  test("qnFrame: single-task twin ≡ relational plan") {
    assert(rows(RobustScaleQueries.qnFrame(day)) ==
      rows(RobustScaleQueries.qnFrame(day, cap = 0L)))
  }

  test("hlFrame: single-task twin ≡ relational plan") {
    val local = rows(RobustScaleQueries.hlFrame(day))
    assert(local == rows(RobustScaleQueries.hlFrame(day, cap = 0L)))
    // 7 days -> 28 Walsh pairs; the pseudomedian halves a pair sum
    assert(local == Seq(Seq(28L, 500L)))
  }

  test("siegelFrame: single-task twin ≡ relational plan") {
    // irregular spacing and sign changes exercise the double divide
    val d = Seq((100L, 5000L), (101L, -1200L), (103L, 7300L),
      (106L, 900L), (110L, 12345L), (111L, -777L))
      .toDF("day", "netl")
      .select(col("day"), col("netl").cast("decimal(38,0)").as("net"))
    assert(rows(RobustTrendQueries.siegelFrame(d)) ==
      rows(RobustTrendQueries.siegelFrame(d, cap = 0L)))
  }
}
