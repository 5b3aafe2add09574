package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.WeakSupervision

/** Round-6: weak-supervision votes — majority/tie semantics, abstain
  * handling, loud invalid votes, long-form matrix shape. */
class WeakSupervisionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("majority, tie->abstain, and abstain votes carry no weight") {
    val df = Seq((1L, 1, 1, -1), (2L, -1, -1, 1), (3L, 1, -1, 0),
      (4L, 0, 0, 0)).toDF("id", "a", "b", "c")
    val out = WeakSupervision.voteAggregate(df,
        Seq(col("a"), col("b"), col("c")))
      .select("id", "n_keep", "n_drop", "majority", "margin")
      .as[(Long, Long, Long, String, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 2L, 1L, "keep", 1L)))
    assert(out(2L) == ((2L, 1L, 2L, "drop", 1L)))
    assert(out(3L) == ((3L, 1L, 1L, "abstain", 0L)))
    assert(out(4L) == ((4L, 0L, 0L, "abstain", 0L)))
  }

  test("a vote outside {-1,0,1} fails loudly") {
    val df = Seq((1L, 5)).toDF("id", "a")
    val ex = intercept[Exception] {
      WeakSupervision.voteAggregate(df, Seq(col("a"))).collect()
    }
    assert(ex.getMessage.contains("outside"))
  }

  test("voteMatrix emits one row per (doc, rule)") {
    val df = Seq((1L, 1, -1)).toDF("id", "a", "b")
    val out = WeakSupervision.voteMatrix(df, "id",
        Seq("ra" -> col("a"), "rb" -> col("b")))
      .as[(Long, String, Long)].collect().toSet
    assert(out == Set((1L, "ra", 1L), (1L, "rb", -1L)))
  }
}
