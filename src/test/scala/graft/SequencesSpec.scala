package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sequences

/** Round-6: contiguous k-gram pattern counts — window completeness,
  * per-entity isolation, occurrence vs entity support. */
class SequencesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def grams(rows: Seq[(String, Long, Long, String)], k: Int) =
    Sequences.kgramCounts(rows.toDF("u", "ts", "id", "typ"),
        "u", "ts", "id", "typ", k)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  test("trigrams slide over the ordered log") {
    val out = grams(Seq(
      ("a", 1L, 1L, "v"), ("a", 2L, 2L, "c"), ("a", 3L, 3L, "b"),
      ("a", 4L, 4L, "v")), k = 3)
    assert(out == Map("v c b" -> ((1L, 1L)), "c b v" -> ((1L, 1L))))
  }

  test("an entity shorter than k contributes nothing") {
    assert(grams(Seq(("a", 1L, 1L, "v"), ("a", 2L, 2L, "c")), k = 3).isEmpty)
  }

  test("patterns never span entities") {
    val out = grams(Seq(
      ("a", 1L, 1L, "v"), ("a", 2L, 2L, "c"),
      ("b", 3L, 3L, "b"), ("b", 4L, 4L, "v")), k = 2)
    assert(out == Map("v c" -> ((1L, 1L)), "b v" -> ((1L, 1L))))
  }

  test("n_occurrences counts repeats; n_entities counts support") {
    val out = grams(Seq(
      ("a", 1L, 1L, "v"), ("a", 2L, 2L, "c"),
      ("a", 3L, 3L, "v"), ("a", 4L, 4L, "c"),
      ("b", 5L, 5L, "v"), ("b", 6L, 6L, "c")), k = 2)
    assert(out("v c") == ((3L, 2L)))
  }

  test("same-ts ordering is pinned by id") {
    val out = grams(Seq(
      ("a", 1L, 2L, "c"), ("a", 1L, 1L, "v")), k = 2)
    assert(out == Map("v c" -> ((1L, 1L))))
  }

  test("a null type occupies its slot but forms no pattern") {
    val df = Seq(
      ("a", 1L, 1L, Option.empty[String]), ("a", 2L, 2L, Some("v")),
      ("a", 3L, 3L, Some("c"))).toDF("u", "ts", "id", "typ")
    val out = Sequences.kgramCounts(df, "u", "ts", "id", "typ", 3)
      .collect()
    // NOT a mislabeled "v c" bigram, and no "null v c" trigram either
    assert(out.isEmpty)
    val out2 = Sequences.kgramCounts(df, "u", "ts", "id", "typ", 2)
      .collect().map(r => r.getString(0)).toSet
    assert(out2 == Set("v c")) // the window clear of the null survives
  }
}
