package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sim.SparseSim
import graft.text.TextAnalysis

/** Round-6: sparse TF-IDF cosine join — posting-list candidates, the
  * maxDf stop-term prune, and exact integer dots/norms. */
class SparseSimSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pairs(rows: Seq[(Long, String)], maxDf: Long, minCos: Double) =
    SparseSim.tfidfCosinePairs(rows.toDF("id", "text"), "id",
        TextAnalysis.tokens(col("text")), maxDf, minCos)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("cos"))
      .toMap

  test("identical docs score ~1; disjoint docs are absent") {
    val out = pairs(Seq(
      1L -> "alpha beta gamma", 2L -> "alpha beta gamma",
      3L -> "delta epsilon zeta"), maxDf = 10, minCos = 0.0)
    assert(out.keySet == Set((1L, 2L)))
    assert(math.abs(out((1L, 2L)) - 1.0) < 1e-12)
  }

  test("a term in more than maxDf docs is pruned before pairing") {
    // 'x' appears in all 3 docs; with maxDf=2 it is dropped, leaving
    // docs 1/2 sharing nothing scoreable
    val out = pairs(Seq(
      1L -> "x aaa", 2L -> "x bbb", 3L -> "x ccc"),
      maxDf = 2, minCos = 0.0)
    assert(out.isEmpty)
  }

  test("threshold filters weak overlaps") {
    val docs = Seq(
      1L -> "aaa bbb ccc ddd", 2L -> "aaa bbb ccc eee", 3L -> "fff ddd")
    val loose = pairs(docs, maxDf = 10, minCos = 0.0)
    val tight = pairs(docs, maxDf = 10, minCos = 0.4)
    assert(loose.contains((1L, 3L)))
    assert(tight.keySet == Set((1L, 2L)))
  }

  test("orientation: doc_a < doc_b, one row per pair") {
    // third doc keeps df < N so the shared terms carry positive idf
    val df = SparseSim.tfidfCosinePairs(
      Seq(9L -> "aaa bbb", 1L -> "aaa bbb", 5L -> "ccc ddd")
        .toDF("id", "text"), "id",
      TextAnalysis.tokens(col("text")), 10, 0.0)
    val rows = df.collect()
    assert(rows.length == 1 && rows.head.getLong(0) == 1L &&
      rows.head.getLong(1) == 9L)
  }

  test("tf weighting: repeating a shared rare term tightens similarity") {
    // doc pair (1,2) shares 'zzz' once each; (3,4) shares it thrice each
    // against the same per-doc unique residue -> higher cosine. Doc 5
    // keeps zzz's df below N so its idf stays positive.
    val out = pairs(Seq(
      1L -> "zzz aaa", 2L -> "zzz bbb",
      3L -> "zzz zzz zzz ccc", 4L -> "zzz zzz zzz ddd",
      5L -> "eee fff"),
      maxDf = 10, minCos = 0.0)
    assert(out((3L, 4L)) > out((1L, 2L)))
  }
}
