package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Stats

/** Round-6: grouped OLS fit (Stats.linearFit) — exact-line recovery,
  * degenerate variance, null handling, and the post-cast pairwise
  * deletion contract (ADVICE r5: n must count exactly the rows the
  * moment sums saw).
  */
class StatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fit(rows: Seq[(String, java.lang.Long, java.lang.Long)]) =
    Stats.linearFit(rows.toDF("g", "x", "y"), Seq("g"), col("x"), col("y"))

  test("recovers an exact line y = 2x + 1 with corr 1.0") {
    val r = fit(Seq(("a", 1L, 3L), ("a", 2L, 5L), ("a", 3L, 7L)))
      .select("n", "corr", "slope", "intercept").head()
    assert(r.getLong(0) == 3L)
    // corr comes from num/(sqrt(dx)·sqrt(dy)) — a perfect line lands
    // within one ulp of 1.0, not necessarily on it.
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    assert(r.getDouble(2) == 2.0)
    assert(r.getDouble(3) == 1.0)
  }

  test("perfect negative fit has corr -1.0") {
    val r = fit(Seq(("a", 1L, 10L), ("a", 2L, 8L), ("a", 4L, 4L)))
      .select("corr", "slope").head()
    assert(math.abs(r.getDouble(0) + 1.0) < 1e-12)
    assert(r.getDouble(1) == -2.0)
  }

  test("zero x-variance: slope/intercept/corr all null") {
    val r = fit(Seq(("a", 5L, 1L), ("a", 5L, 9L)))
      .select("corr", "slope", "intercept").head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("zero y-variance: corr null but the flat fit is valid") {
    val r = fit(Seq(("a", 1L, 7L), ("a", 3L, 7L)))
      .select("corr", "slope", "intercept").head()
    assert(r.isNullAt(0))
    assert(r.getDouble(1) == 0.0)
    assert(r.getDouble(2) == 7.0)
  }

  test("null x or y drops the pair; n matches the sums' row set") {
    val r = fit(Seq(("a", 1L, 3L), ("a", null, 99L), ("a", 2L, null),
        ("a", 3L, 7L)))
      .select("n", "sx", "sy").head()
    assert(r.getLong(0) == 2L)
    assert(r.getDecimal(1).longValueExact == 4L)
    assert(r.getDecimal(2).longValueExact == 10L)
  }

  test("value beyond DECIMAL(18,0) is dropped from n AND the sums") {
    // 10^18 cannot be represented at decimal(18,0): the cast nulls it
    // and the null filter (which runs post-cast) must drop the row
    // from the count too — not count a row the sums skipped.
    val big = 1000000000000000000L
    val r = fit(Seq(("a", 1L, 1L), ("a", 2L, 2L), ("a", big, 3L)))
      .select("n", "sx").head()
    assert(r.getLong(0) == 2L)
    assert(r.getDecimal(1).longValueExact == 3L)
  }

  private def giniOf(values: Seq[Long]): Option[Double] = {
    val rows = values.zipWithIndex.map { case (v, i) => ("a", i.toLong, v) }
    val r = Stats.gini(rows.toDF("g", "id", "v"), Seq("g"), "v", "id")
      .select("gini").head()
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  test("gini: perfect equality is 0") {
    assert(giniOf(Seq(5L, 5L, 5L, 5L)).contains(0.0))
  }

  test("gini: total concentration approaches (n-1)/n") {
    assert(giniOf(Seq(0L, 0L, 0L, 100L)).contains(0.75))
  }

  test("gini: textbook example") {
    // values 1,2,3,4: G = (2*(1+4+9+16) - 5*10) / (4*10) = 10/40.
    assert(giniOf(Seq(1L, 2L, 3L, 4L)).contains(0.25))
  }

  test("gini: all-zero group yields null") {
    assert(giniOf(Seq(0L, 0L)).isEmpty)
  }

  test("gini: tie order cannot move the result") {
    assert(giniOf(Seq(3L, 1L, 3L, 3L, 1L)) == giniOf(Seq(1L, 1L, 3L, 3L, 3L)))
  }

  test("groups are independent") {
    val out = fit(Seq(("a", 1L, 2L), ("a", 2L, 4L), ("b", 1L, 5L),
        ("b", 2L, 3L)))
      .select("g", "slope").collect().map(r => r.getString(0) -> r.getDouble(1))
      .toMap
    assert(out("a") == 2.0 && out("b") == -2.0)
  }
}
