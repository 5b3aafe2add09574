package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.OrderStats

/** Round-6: quantile normalization — within-group permille mapped to
  * global order statistics, ties, and single-member groups. */
class QuantileNormSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String, Long)]) =
    OrderStats.quantileNormalize(rows.toDF("id", "g", "v"),
        Seq("g"), "v", "id")
      .collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("permille"), r.getAs[Long]("normalized")))
      .toMap

  test("group extremes map to global extremes") {
    // group a: 1,2,3 ; group b: 100,200,300 — each group's min lands on
    // the global min (1), each max on the global max (300)
    val out = run(Seq(
      (1L, "a", 1L), (2L, "a", 2L), (3L, "a", 3L),
      (4L, "b", 100L), (5L, "b", 200L), (6L, "b", 300L)))
    assert(out(1L) == ((0L, 1L)) && out(4L) == ((0L, 1L)))
    assert(out(3L) == ((1000L, 300L)) && out(6L) == ((1000L, 300L)))
    // mid permille 500 -> global rank ceil(500*6/1000)=3 -> value 3
    assert(out(2L) == ((500L, 3L)) && out(5L) == ((500L, 3L)))
  }

  test("a single-member group maps to the global minimum (permille 0)") {
    val out = run(Seq((1L, "a", 50L), (2L, "b", 1L), (3L, "b", 99L)))
    assert(out(1L)._1 == 0L && out(1L)._2 == 1L)
  }

  test("within-group ties share a permille and a normalized value") {
    val out = run(Seq(
      (1L, "a", 5L), (2L, "a", 5L), (3L, "a", 9L), (4L, "a", 1L)))
    assert(out(1L) == out(2L))
  }

  test("identical distributions are unchanged by normalization") {
    // one group == global: normalized(v) == an actual value at the same
    // quantile; for distinct values 10,20,30,40: each maps to itself
    val out = run(Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L), (4L, "a", 40L)))
    assert(out.values.map(_._2).toSet == Set(10L, 20L, 30L, 40L))
    assert(out(1L)._2 == 10L && out(4L)._2 == 40L)
  }
}
