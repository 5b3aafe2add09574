package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.WeakSupervision

/** Round-6: pairwise Cohen's kappa — exact rational agreement
  * correction against hand-computed contingency tables. */
class KappaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def kappa(rows: Seq[(Long, Int, Int)]) = {
    val df = rows.toDF("id", "a", "b")
    WeakSupervision.pairwiseKappa(df, "id",
        Seq("ra" -> col("a"), "rb" -> col("b")))
      .collect().map(r =>
        (r.getLong(2), r.getLong(3),
          r.getDecimal(4).longValueExact, r.getDecimal(5).longValueExact,
          Option(r.get(6)).map(_.asInstanceOf[Double]))).head
  }

  test("perfect agreement -> kappa 1") {
    // votes differ across items so marginals aren't constant
    val (n, a, num, den, k) = kappa(Seq(
      (1L, 1, 1), (2L, -1, -1), (3L, 0, 0), (4L, 1, 1)))
    assert(n == 4L && a == 4L && num == den && k.contains(1.0))
  }

  test("hand-computed 2x2 example") {
    // 10 items: both keep 4, both drop 2, a-keep/b-drop 3, a-drop/b-keep 1
    // A=6, na=(7,3), nb=(5,5) -> P=7*5+3*5=50, num=60-50=10, den=100-50=50
    val rows = Seq.fill(4)((1, 1)) ++ Seq.fill(2)((-1, -1)) ++
      Seq.fill(3)((1, -1)) ++ Seq.fill(1)((-1, 1))
    val (n, a, num, den, k) =
      kappa(rows.zipWithIndex.map { case ((va, vb), i) => (i.toLong, va, vb) })
    assert(n == 10L && a == 6L && num == 10L && den == 50L)
    assert(k.contains(0.2))
  }

  test("independence-shaped table -> kappa 0") {
    // joint counts proportional to marginal products: na=(2,2), nb=(2,2),
    // each cell 1 -> A=2, P=8, num=2*4-8=0
    val (_, _, num, _, k) = kappa(Seq(
      (1L, 1, 1), (2L, 1, -1), (3L, -1, 1), (4L, -1, -1)))
    assert(num == 0L && k.contains(0.0))
  }

  test("both rules constant and equal -> den 0, null kappa") {
    val (n, a, num, den, k) = kappa(Seq((1L, 1, 1), (2L, 1, 1)))
    assert(n == 2L && a == 2L && num == 0L && den == 0L && k.isEmpty)
  }

  test("abstain-abstain counts as agreement") {
    val (_, a, _, _, _) = kappa(Seq((1L, 0, 0), (2L, 1, -1)))
    assert(a == 1L)
  }

  test("three rules emit three oriented pairs") {
    val df = Seq((1L, 1, 0, -1)).toDF("id", "a", "b", "c")
    val out = WeakSupervision.pairwiseKappa(df, "id",
        Seq("ra" -> col("a"), "rb" -> col("b"), "rc" -> col("c")))
      .select("rule_a", "rule_b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("ra", "rb"), ("ra", "rc"), ("rb", "rc")))
  }
}
