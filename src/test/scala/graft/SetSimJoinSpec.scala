package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.SetSimJoin

/** Round-6: exact prefix-filter set-similarity join — completeness vs
  * the naive all-pairs answer (the lossless-pruning claim), threshold
  * edge cases, duplicate elements, empty sets.
  */
class SetSimJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pairs(df: DataFrame, t100: Int) =
    SetSimJoin.jaccardPairs(df, "id", "s", t100)
      .as[(Long, Long, Long, Long)].collect().sortBy(p => (p._1, p._2)).toSeq

  private def naive(
      rows: Seq[(Long, Seq[String])], t100: Int): Seq[(Long, Long, Long, Long)] =
    (for {
      (a, sa0) <- rows; (b, sb0) <- rows if a < b
      sa = sa0.toSet; sb = sb0.toSet
      inter = (sa & sb).size.toLong
      uni = (sa | sb).size.toLong
      if uni > 0 && inter * 100 >= t100 * uni
    } yield (a, b, inter, uni)).sortBy(p => (p._1, p._2))

  test("matches the naive all-pairs join exactly (completeness)") {
    val rows: Seq[(Long, Seq[String])] = Seq(
      1L -> Seq("a", "b", "c", "d"),
      2L -> Seq("a", "b", "c", "e"),      // J(1,2) = 3/5 = 0.6
      3L -> Seq("a", "b", "c", "d"),      // J(1,3) = 1.0
      4L -> Seq("x", "y", "z"),           // disjoint from 1-3
      5L -> Seq("x", "y", "z", "w", "v"), // J(4,5) = 3/5
      6L -> Seq("q"))
    val df = rows.toDF("id", "s")
    for (t <- Seq(50, 60, 61, 80, 100))
      assert(pairs(df, t) == naive(rows, t), s"t100=$t")
  }

  test("threshold boundary: >= not >") {
    // J = 1/2 exactly at t100=50.
    val df = Seq(1L -> Seq("a", "b"), 2L -> Seq("a")).toDF("id", "s")
    assert(pairs(df, 50) == Seq((1L, 2L, 1L, 2L)))
    assert(pairs(df, 51).isEmpty)
  }

  test("duplicate elements inside a set count once") {
    val df = Seq(1L -> Seq("a", "a", "b"), 2L -> Seq("a", "b", "b"))
      .toDF("id", "s")
    assert(pairs(df, 100) == Seq((1L, 2L, 2L, 2L)))
  }

  test("empty sets match nothing, even each other") {
    val df = Seq(1L -> Seq.empty[String], 2L -> Seq.empty[String],
      3L -> Seq("a")).toDF("id", "s")
    assert(pairs(df, 50).isEmpty)
  }

  private def naiveContain(
      rows: Seq[(Long, Seq[String])], t100: Int): Seq[(Long, Long, Long)] =
    (for {
      (a, sa0) <- rows; (b, sb0) <- rows if a != b
      sa = sa0.toSet; sb = sb0.toSet
      inter = (sa & sb).size.toLong
      if sa.nonEmpty && inter * 100 >= t100 * sa.size
    } yield (a, b, inter)).sortBy(p => (p._1, p._2))

  private def contain(rows: Seq[(Long, Seq[String])], t100: Int) =
    SetSimJoin.containmentPairs(rows.toDF("id", "s"), "id", "s", t100)
      .select("a", "b", "inter").as[(Long, Long, Long)]
      .collect().sortBy(p => (p._1, p._2)).toSeq

  test("containment matches the naive directional join exactly") {
    val rows: Seq[(Long, Seq[String])] = Seq(
      1L -> Seq("a", "b"),                       // fully inside 2 and 3
      2L -> Seq("a", "b", "c", "d", "e", "f"),
      3L -> Seq("a", "b", "z"),
      4L -> Seq("q", "r"),
      5L -> Seq.empty)
    for (t <- Seq(50, 90, 100))
      assert(contain(rows, t) == naiveContain(rows, t), s"t100=$t")
  }

  test("containment is directional: the quote is in the page, not back") {
    val rows: Seq[(Long, Seq[String])] = Seq(
      1L -> Seq("a", "b"),
      2L -> (Seq("a", "b") ++ (1 to 20).map(i => s"x$i")))
    assert(contain(rows, 100) == Seq((1L, 2L, 2L)))
  }

  test("skewed hot element: rare-first prefixes still find all pairs") {
    // "hot" is in every set; pairs must still be exact.
    val rows: Seq[(Long, Seq[String])] =
      (1L to 20L).map(i => i -> Seq("hot", s"u$i", s"v$i")) ++
        Seq(100L -> Seq("hot", "u1", "v1"))
    assert(pairs(rows.toDF("id", "s"), 80) == naive(rows, 80))
    assert(pairs(rows.toDF("id", "s"), 50) == naive(rows, 50))
  }
}
