package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Stats

/** Round-6: chi-square goodness-of-fit — exact-rational terms,
  * zero-count categories, unexpected-category accounting. */
class ChiSquareSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(String, String)], exp: Seq[(String, Long)]) =
    Stats.chiSquareGof(rows.toDF("g", "c"), Seq("g"), col("c"), exp)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap

  test("perfect fit -> chi2 0") {
    val out = run(
      Seq(("g", "a"), ("g", "a"), ("g", "b"), ("g", "b")),
      Seq("a" -> 500000L, "b" -> 500000L))
    assert(out("g") == ((4L, 0L, 0.0)))
  }

  test("hand-computed 2-category example") {
    // n=10, e=(.5,.5): o=(8,2) -> chi2 = (8-5)^2/5 + (2-5)^2/5 = 3.6
    val rows = Seq.fill(8)(("g", "a")) ++ Seq.fill(2)(("g", "b"))
    val (n, nu, chi2) = run(rows, Seq("a" -> 500000L, "b" -> 500000L))("g")
    assert(n == 10L && nu == 0L)
    assert(math.abs(chi2 - 3.6) < 1e-9)
  }

  test("a zero-count expected category still contributes its term") {
    // n=4 all 'a', e=(.5,.5): chi2 = (4-2)^2/2 + (0-2)^2/2 = 4.0
    val (_, _, chi2) = run(Seq.fill(4)(("g", "a")),
      Seq("a" -> 500000L, "b" -> 500000L))("g")
    assert(math.abs(chi2 - 4.0) < 1e-9)
  }

  test("unexpected categories are counted and excluded from the statistic") {
    val rows = Seq.fill(2)(("g", "a")) ++ Seq.fill(2)(("g", "b")) ++
      Seq.fill(3)(("g", "zzz"))
    val (n, nu, chi2) = run(rows, Seq("a" -> 500000L, "b" -> 500000L))("g")
    assert(n == 4L && nu == 3L)
    assert(math.abs(chi2 - 0.0) < 1e-9)
  }

  test("groups are independent") {
    val out = run(
      Seq.fill(8)(("x", "a")) ++ Seq.fill(2)(("x", "b")) ++
        Seq(("y", "a"), ("y", "b")),
      Seq("a" -> 500000L, "b" -> 500000L))
    assert(math.abs(out("x")._3 - 3.6) < 1e-9)
    assert(math.abs(out("y")._3 - 0.0) < 1e-9)
  }

  test("duplicate or non-positive expected weights are rejected") {
    intercept[IllegalArgumentException] {
      Stats.chiSquareGof(Seq(("g", "a")).toDF("g", "c"), Seq("g"), col("c"),
        Seq("a" -> 1L, "a" -> 2L))
    }
    intercept[IllegalArgumentException] {
      Stats.chiSquareGof(Seq(("g", "a")).toDF("g", "c"), Seq("g"), col("c"),
        Seq("a" -> 0L))
    }
  }
}
