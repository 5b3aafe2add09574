package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Anomaly

/** Round-6: robust MAD outlier flags — lower-median rank semantics,
  * robustness against the wild point itself, even-n groups, loud
  * nulls, group independence.
  */
class MadFlagsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(String, java.lang.Long)], k: Int = 3) =
    Anomaly.madFlags(rows.toDF("g", "v"), Seq("g"), "v", k)
      .select("g", "v", "median", "abs_dev", "mad", "is_outlier")
      .as[(String, Long, Long, Long, Long, Boolean)]
      .collect().sortBy(r => (r._1, r._2)).toSeq

  test("median 3, mad 1: only the wild point flags at k=3") {
    val out = run(Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L),
      ("a", 100L)))
    assert(out.forall(r => r._3 == 3L && r._5 == 1L))
    assert(out.map(r => r._2 -> r._6).toMap ==
      Map(1L -> false, 2L -> false, 3L -> false, 4L -> false, 100L -> true))
  }

  test("a wild point cannot unflag itself by inflating the spread") {
    // With mean/stddev, 100 inflates sigma enough to hide itself at
    // small n; MAD must still flag it.
    val out = run(Seq(("a", 10L), ("a", 11L), ("a", 12L), ("a", 100L)))
    assert(out.find(_._2 == 100L).get._6)
  }

  test("even n takes the lower median") {
    val out = run(Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L)), k = 1)
    assert(out.head._3 == 2L)
    assert(out.head._5 == 1L)
    assert(out.map(r => r._2 -> r._6).toMap ==
      Map(1L -> false, 2L -> false, 3L -> false, 4L -> true))
  }

  test("groups are independent") {
    val out = run(Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 100L), ("b", 200L), ("b", 300L)))
    assert(out.filter(_._1 == "a").head._3 == 2L)
    assert(out.filter(_._1 == "b").head._3 == 200L)
    assert(out.forall(!_._6))
  }

  test("null value fails loudly") {
    val ex = intercept[Exception] {
      Anomaly.madFlags(Seq(("a", Some(1L)), ("a", None))
        .toDF("g", "v"), Seq("g"), "v", 3).collect()
    }
    assert(ex.getMessage.contains("null v"))
  }
}
