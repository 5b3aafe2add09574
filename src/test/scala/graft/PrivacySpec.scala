package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.Privacy

/** Round-6: k-anonymity gate — class counting, k boundary, null QI
  * classes, multi-column identifiers. */
class PrivacySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("classes below k flag, classes at k do not") {
    val df = Seq(("en", 1L), ("en", 2L), ("en", 3L), ("de", 4L))
      .toDF("lang", "id")
    val out = Privacy.kAnonymity(df, Seq("lang"), 3)
      .select("id", "qi_count", "is_suppressed")
      .as[(Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
    assert(out == Seq((1L, 3L, false), (2L, 3L, false), (3L, 3L, false),
      (4L, 1L, true)))
  }

  test("null QI values form their own equivalence class") {
    val df = Seq((Some("en"), 1L), (None, 2L), (None, 3L))
      .toDF("lang", "id")
    val out = Privacy.kAnonymity(df, Seq("lang"), 2)
      .select("id", "qi_count").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 2L, 3L -> 2L))
  }

  test("multi-column identifiers count the combination, not the parts") {
    val df = Seq(("en", 10L, 1L), ("en", 20L, 2L), ("en", 10L, 3L))
      .toDF("lang", "b", "id")
    val out = Privacy.kAnonymity(df, Seq("lang", "b"), 2)
      .select("id", "is_suppressed").as[(Long, Boolean)].collect().toMap
    assert(out == Map(1L -> false, 3L -> false, 2L -> true))
  }
}
