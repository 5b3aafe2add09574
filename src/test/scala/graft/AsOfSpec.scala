package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOf

class AsOfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("as-of join attaches the most recent quote at-or-before each probe") {
    val probe = Seq((1L, 10L), (1L, 20L), (1L, 35L), (2L, 5L))
      .toDF("k", "ts")
    val quote = Seq((1L, 10L, "a"), (1L, 30L, "b"), (2L, 50L, "z"))
      .toDF("k", "ts", "v")
    val out = AsOf.asOfJoin(probe, quote, Seq("k"), "ts", Seq("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> Option(r.getString(2))).toMap
    assert(out((1L, 10L)) === Some("a")) // inclusive at equal ts
    assert(out((1L, 20L)) === Some("a"))
    assert(out((1L, 35L)) === Some("b"))
    assert(out((2L, 5L)) === None)       // nothing before
  }

  test("as-of join attaches the matched quote row atomically, nulls included") {
    val probe = Seq((1L, 40L)).toDF("k", "ts")
    val quote = Seq(
      (1L, 10L, Option("old"), Option(100)),
      (1L, 30L, Option.empty[String], Option(200)))
      .toDF("k", "ts", "v", "w")
    val out = AsOf.asOfJoin(probe, quote, Seq("k"), "ts", Seq("v", "w"))
      .collect().head
    // the matched quote (ts=30) has v=null: the null must be attached, not
    // an older quote's value (merge_asof / ASOF JOIN row-atomic semantics)
    assert(out.isNullAt(out.fieldIndex("asof_v")))
    assert(out.getInt(out.fieldIndex("asof_w")) === 200)
  }

  test("approx sketches stay within their accuracy envelope") {
    val df = (1 to 20000).map(i => (i % 4, i % 1000)).toDF("g", "v")
    val row = df.groupBy($"g")
      .agg(
        approx_count_distinct($"v", rsd = 0.02).as("approx"),
        countDistinct($"v").as("exact"))
      .collect()
    row.foreach { r =>
      val (a, e) = (r.getAs[Long]("approx"), r.getAs[Long]("exact"))
      assert(math.abs(a - e).toDouble / e < 0.06, s"approx $a vs exact $e")
    }
  }
}
