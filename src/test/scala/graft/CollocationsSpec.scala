package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.Collocations

/** Round-6: PMI collocations — exact rational interior, prune-before-
  * join, and the sign semantics of association. */
class CollocationsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(texts: Seq[String], minCount: Long = 1L) =
    Collocations.pmiPairs(texts.toDF("text"), col("text"), minCount)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap

  test("a pair that always co-occurs scores positive PMI") {
    // corpus: "aa bb" x4 -> c_pair=4, T2=4, c_aa=c_bb=4, T1=8
    // ratio = 4*64/(4*16) = 4 -> pmi = ln(4) = 1.386294 -> 1386
    val out = run(Seq.fill(4)("aa bb"))
    assert(out(("aa", "bb")) == ((4L, 4L, 4L, 1386L)))
  }

  test("independent-ish adjacency scores near zero") {
    // "aa bb" and "bb aa": each pair once, T2=2, T1=4, c=2 each
    // ratio = 1*16/(2*4) = 2 -> ln 2 = 0.693147 -> 693 for both
    val out = run(Seq("aa bb", "bb aa"))
    assert(out(("aa", "bb"))._4 == 693L)
    assert(out(("bb", "aa"))._4 == 693L)
  }

  test("negative PMI floors toward minus infinity") {
    // make 'aa','bb' frequent but adjacent only once among many bigrams
    // corpus: "aa aa aa aa", "bb bb bb bb", "aa bb":
    // T1 = 10, c_aa = 5, c_bb = 5, bigrams: aa-aa x3, bb-bb x3, aa-bb x1
    // T2 = 7, ratio = 1*100/(7*25) = 0.5714 -> ln = -0.5596 -> floor(-559.6)= -560
    val out = run(Seq("aa aa aa aa", "bb bb bb bb", "aa bb"))
    assert(out(("aa", "bb"))._4 == -560L)
  }

  test("minCount prunes pairs before scoring but not the totals") {
    val all = run(Seq("aa aa aa aa", "bb bb bb bb", "aa bb"), minCount = 1)
    val pruned = run(Seq("aa aa aa aa", "bb bb bb bb", "aa bb"), minCount = 2)
    assert(all.contains(("aa", "bb")) && !pruned.contains(("aa", "bb")))
    // surviving pair's pmi unchanged by the prune (T2 still counts all)
    assert(all(("aa", "aa")) == pruned(("aa", "aa")))
  }
}
