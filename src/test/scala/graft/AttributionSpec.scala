package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Attribution

/** Round-6: last-touch attribution — window eligibility (strictly
  * preceding under (ts, id)), lookback expiry, latest-touch-wins. */
class AttributionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long, String)], lookback: Long = 100L) =
    Attribution.lastTouch(
      rows.toDF("u", "ts", "id", "typ"),
      "u", "ts", "id", "typ",
      convType = "buy", touchTypes = Seq("click", "view"),
      lookback = lookback)
      .collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[String]("attributed_channel"),
          Option(r.getAs[Any]("touch_ts")).map(_.asInstanceOf[Long])))
      .toMap

  test("latest eligible touch wins") {
    val out = run(Seq(
      ("a", 10L, 1L, "click"), ("a", 20L, 2L, "view"), ("a", 30L, 3L, "buy")))
    assert(out(3L) == (("view", Some(20L))))
  }

  test("conversion with no preceding touch -> (none)") {
    val out = run(Seq(("a", 10L, 1L, "buy"), ("a", 20L, 2L, "click")))
    assert(out(1L) == (("(none)", None)))
  }

  test("touch older than the lookback -> (none)") {
    val out = run(Seq(
      ("a", 10L, 1L, "click"), ("a", 500L, 2L, "buy")), lookback = 100L)
    assert(out(2L) == (("(none)", None)))
  }

  test("same-ts tie: smaller-id touch counts, larger-id does not") {
    val out = run(Seq(
      ("a", 10L, 1L, "click"), ("a", 10L, 2L, "buy"),
      ("b", 10L, 9L, "buy"), ("b", 10L, 8L, "view")))
    assert(out(2L) == (("click", Some(10L))))
    assert(out(9L) == (("view", Some(10L))))
  }

  test("a preceding conversion is not a touch") {
    val out = run(Seq(
      ("a", 10L, 1L, "click"), ("a", 20L, 2L, "buy"), ("a", 30L, 3L, "buy")))
    assert(out(2L) == (("click", Some(10L))))
    assert(out(3L) == (("click", Some(10L)))) // still the click, not the buy
  }

  test("attribution is per-entity — other users' touches never leak") {
    val out = run(Seq(("a", 10L, 1L, "click"), ("b", 20L, 2L, "buy")))
    assert(out(2L) == (("(none)", None)))
  }

  test("convType listed as a touch type is rejected") {
    intercept[IllegalArgumentException] {
      Attribution.lastTouch(Seq(("a", 1L, 1L, "x")).toDF("u", "ts", "id", "typ"),
        "u", "ts", "id", "typ", "buy", Seq("buy", "click"), 10L)
    }
  }

  private def linear(rows: Seq[(String, Long, Long, String)],
      lookback: Long = 100L) =
    Attribution.linearTouch(rows.toDF("u", "ts", "id", "typ"),
        "u", "ts", "id", "typ", "buy", Seq("click", "view"), lookback)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3),
          r.getDecimal(4).doubleValue()))
      .toMap

  test("linear: touches split the credit by channel counts") {
    // 2 clicks + 1 view before the buy -> click 2/3, view 1/3
    val out = linear(Seq(
      ("a", 10L, 1L, "click"), ("a", 20L, 2L, "click"),
      ("a", 30L, 3L, "view"), ("a", 40L, 4L, "buy")))
    assert(out((4L, "click")) == ((2L, 3L, 0.666666667))) // HALF_UP at 9dp
    assert(out((4L, "view")) == ((1L, 3L, 0.333333333)))
  }

  test("linear: lookback and the strictly-before rule gate eligibility") {
    val out = linear(Seq(
      ("a", 1L, 1L, "click"), // expired (lookback 100, conv at 500)
      ("a", 450L, 2L, "view"),
      ("a", 500L, 3L, "buy"),
      ("a", 500L, 4L, "click")), lookback = 100L) // same-ts, larger id
    assert(out((3L, "view")) == ((1L, 1L, 1.0)))
    assert(!out.contains((3L, "click")))
  }

  test("linear: a conversion with no eligible touch gets the (none) row") {
    val out = linear(Seq(("a", 10L, 1L, "buy")))
    assert(out((1L, "(none)")) == ((0L, 0L, 1.0)))
  }

  test("linear agrees with lastTouch when exactly one touch is eligible") {
    val rows = Seq(("a", 10L, 1L, "view"), ("a", 20L, 2L, "buy"))
    val lin = linear(rows)
    assert(lin((2L, "view")) == ((1L, 1L, 1.0)))
    val last = Attribution.lastTouch(rows.toDF("u", "ts", "id", "typ"),
        "u", "ts", "id", "typ", "buy", Seq("click", "view"), 100L)
      .collect().head.getAs[String]("attributed_channel")
    assert(last == "view")
  }

  private def ushaped(rows: Seq[(String, Long, Long, String)],
      lookback: Long = 100L) =
    Attribution.uShapedTouch(
      rows.toDF("u", "ts", "id", "typ"),
      "u", "ts", "id", "typ",
      convType = "buy", touchTypes = Seq("click", "view"),
      lookback = lookback)
      .collect()
      .map(r => (r.getAs[Long]("conversion_id"), r.getAs[Int]("position")) ->
        (r.getAs[String]("channel"), r.getAs[Long]("credit_micro")))
      .toMap

  test("ushaped: 40/20/40 split with integer middle shares") {
    // 4 touches: 400k, 100k, 100k, 400k
    val out = ushaped(Seq(
      ("a", 10L, 1L, "click"), ("a", 20L, 2L, "view"),
      ("a", 30L, 3L, "view"), ("a", 40L, 4L, "click"),
      ("a", 50L, 5L, "buy")))
    assert(out((5L, 1)) == (("click", 400000L)))
    assert(out((5L, 2)) == (("view", 200000L / 2)))
    assert(out((5L, 3)) == (("view", 200000L / 2)))
    assert(out((5L, 4)) == (("click", 400000L)))
  }

  test("ushaped: 1 and 2 touches get the degenerate splits") {
    val one = ushaped(Seq(("a", 10L, 1L, "view"), ("a", 20L, 2L, "buy")))
    assert(one((2L, 1)) == (("view", 1000000L)))
    val two = ushaped(Seq(
      ("a", 10L, 1L, "view"), ("a", 20L, 2L, "click"),
      ("a", 30L, 3L, "buy")))
    assert(two((3L, 1)) == (("view", 500000L)))
    assert(two((3L, 2)) == (("click", 500000L)))
  }

  test("ushaped: 3 middles truncate (200000 div 3) and total stays <= 1e6") {
    val out = ushaped(Seq(
      ("a", 10L, 1L, "click"), ("a", 20L, 2L, "view"),
      ("a", 30L, 3L, "view"), ("a", 40L, 4L, "view"),
      ("a", 50L, 5L, "click"), ("a", 60L, 6L, "buy")))
    assert(out((6L, 2))._2 == 66666L)
    val total = out.collect { case ((6L, _), (_, c)) => c }.sum
    assert(total == 400000L + 3 * 66666L + 400000L)
  }

  test("ushaped: no eligible touch -> single (none) full-credit row") {
    val out = ushaped(Seq(("a", 10L, 1L, "buy")))
    assert(out((1L, 0)) == (("(none)", 1000000L)))
  }

  test("ushaped: eligibility matches linear (lookback + strictly-before)") {
    val out = ushaped(Seq(
      ("a", 1L, 1L, "click"), // expired at conv ts 500 (lookback 100)
      ("a", 450L, 2L, "view"),
      ("a", 500L, 3L, "buy"),
      ("a", 500L, 4L, "click")), lookback = 100L) // same-ts larger id
    assert(out((3L, 1)) == (("view", 1000000L)))
    assert(out.keys.count(_._1 == 3L) == 1)
  }
}
