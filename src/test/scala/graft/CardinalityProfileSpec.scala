package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Profile

/** Round-6: cardinality profile — per-column rows/nulls/distinct-est,
  * all-null columns, string-form hashing domain. */
class CardinalityProfileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("rows, nulls, and saturation-free estimates per column") {
    val df = Seq(("a", Some(1L)), ("b", Some(1L)), ("a", None))
      .toDF("s", "v")
    val out = Profile.cardinality(df, Seq("s", "v"), m = 64)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getAs[Long]("d"))).toMap
    assert(out("s") == ((3L, 0L, 2L)))
    assert(out("v")._1 == 3L && out("v")._2 == 1L && out("v")._3 == 1L)
  }

  test("an all-null column reports nulls but no sketch row") {
    val df = Seq((1L, Option.empty[String]), (2L, None)).toDF("id", "x")
    val r = Profile.cardinality(df, Seq("x"), m = 64).head()
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5))
  }

  test("values hash by string form: 1L and \"1\" collide by design") {
    val df = Seq((1L, "1")).toDF("n", "s")
    val out = Profile.cardinality(df, Seq("n", "s"), m = 64)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("d")).toMap
    assert(out("n") == out("s"))
  }
}
