package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.CountMin

/** CMS invariants: estimates never under-count, a collision-free width
  * recovers exact counts, absent items estimate zero, and the sketch
  * never exceeds depth × width rows.
  */
class CountMinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // Zipf-ish fixture: item k appears ~60/k times
  private lazy val items = (1 to 12).flatMap(k =>
    Seq.fill(60 / k)(s"item$k")).toDF("x")

  private lazy val exact = items.groupBy("x")
    .agg(count(lit(1)).as("exact")).collect()
    .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("estimates never under-count; tight width stays within the bound") {
    val sketch = CountMin.build(items, "x", depth = 4, width = 16)
    assert(sketch.count() <= 4 * 16)
    val est = CountMin.estimate(sketch, items.distinct(), "x",
      depth = 4, width = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, v) =>
      assert(est(k) >= v, s"$k under-counted: ${est(k)} < $v")
    }
  }

  test("collision-free width recovers exact counts") {
    val sketch = CountMin.build(items, "x", depth = 4, width = 65536)
    val est = CountMin.estimate(sketch, items.distinct(), "x",
      depth = 4, width = 65536)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est === exact)
  }

  test("merge of split-corpus sketches equals the whole-corpus sketch") {
    val (a, b) = (items.filter(col("x") <= "item4"),
      items.filter(col("x") > "item4"))
    val whole = CountMin.build(items, "x", depth = 4, width = 16)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = CountMin.merge(
        CountMin.build(a, "x", depth = 4, width = 16),
        CountMin.build(b, "x", depth = 4, width = 16))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged === whole)
  }

  test("absent items estimate zero at ample width") {
    val sketch = CountMin.build(items, "x", depth = 4, width = 65536)
    val est = CountMin.estimate(sketch,
      Seq("never_seen_a", "never_seen_b").toDF("x"), "x",
      depth = 4, width = 65536)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.values.forall(_ === 0L))
  }
}
