package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.IncrementalJoin

/** Round-5 wave 13: incremental join maintenance — the insert-only
  * delta identity against the from-scratch join.
  */
class IncrementalJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val a = (1L to 200L).map(i => (i % 40, i)).toDF("ak", "av")
  private lazy val b = (1L to 120L).map(i => (i % 50, i * 10)).toDF("bk", "bv")

  private def canon(df: DataFrame) =
    df.select("ak", "av", "bk", "bv").as[(Long, Long, Long, Long)]
      .collect().sorted.toSeq

  test("maintained equals the from-scratch join for every two-sided cut") {
    val whole = canon(a.join(b, $"ak" === $"bk"))
    for ((ca, cb) <- Seq((50L, 30L), (1L, 1L), (200L, 120L), (120L, 60L))) {
      // (1,1): old sides empty — everything flows through the delta
      // terms; (200,120): deltas empty — the old view IS the answer
      val (aO, aD) = (a.where($"av" <= ca), a.where($"av" > ca))
      val (bO, bD) = (b.where($"bv" <= cb * 10), b.where($"bv" > cb * 10))
      val got = canon(IncrementalJoin.maintained(
        aO.join(bO, $"ak" === $"bk"), aO, aD, bO, bD, "ak", "bk"))
      assert(got == whole, s"cut=($ca,$cb)")
    }
  }

  test("delta terms are exactly the new rows, no duplicates") {
    val (aO, aD) = (a.where($"av" <= 100), a.where($"av" > 100))
    val (bO, bD) = (b.where($"bv" <= 500), b.where($"bv" > 500))
    val delta = canon(IncrementalJoin.deltaInner(aO, aD, bO, bD, "ak", "bk"))
    val expected = canon(a.join(b, $"ak" === $"bk"))
      .diff(canon(aO.join(bO, $"ak" === $"bk")))
    assert(delta == expected)
  }

  test("disjoint column names are enforced") {
    val bad = a.withColumnRenamed("av", "ak2").withColumnRenamed("ak", "av")
    assertThrows[IllegalArgumentException] {
      IncrementalJoin.deltaInner(a, a, bad, bad, "av", "av")
    }
  }
}
