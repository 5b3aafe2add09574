package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Profile

/** Round-6: distribution-shape moments — hand-computed skew/kurtosis,
  * symmetry zeroes, constant-group nulls. */
class ShapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(String, Long)]) =
    Profile.shape(rows.toDF("g", "v"), Seq("g"), "v")
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]),
          Option(r.get(3)).map(_.asInstanceOf[Double])))
      .toMap

  test("a symmetric distribution has zero skewness") {
    val (_, skew, _) = run(Seq(("g", 1L), ("g", 2L), ("g", 3L)))("g")
    assert(math.abs(skew.get) < 1e-12)
  }

  test("uniform {1,2,3}: excess kurtosis = -1.5 exactly") {
    // m2 = 2/3, m4 = 2/3; kurt = (2/3)/(4/9) - 3 = 1.5 - 3 = -1.5
    val (_, _, kurt) = run(Seq(("g", 1L), ("g", 2L), ("g", 3L)))("g")
    assert(math.abs(kurt.get - (-1.5)) < 1e-12)
  }

  test("hand-computed right skew: {0,0,0,4}") {
    // mean 1, m2 = 3, m3 = (3·(-1)^3 + 27)/4 = 6, skew = 6/3^1.5
    val (_, skew, _) = run(Seq(("g", 0L), ("g", 0L), ("g", 0L), ("g", 4L)))("g")
    assert(math.abs(skew.get - 6.0 / math.pow(3.0, 1.5)) < 1e-12)
    // mirrored -> negated
    val (_, skewL, _) = run(Seq(("g", 0L), ("g", 0L), ("g", 0L), ("g", -4L)))("g")
    assert(math.abs(skewL.get + skew.get) < 1e-12)
  }

  test("a constant group yields nulls (m2 = 0)") {
    val (n, skew, kurt) = run(Seq(("g", 5L), ("g", 5L)))("g")
    assert(n == 2L && skew.isEmpty && kurt.isEmpty)
  }

  test("groups are independent; nulls drop") {
    val df = Seq(("a", Some(1L)), ("a", Some(2L)), ("a", Some(3L)),
      ("b", Some(7L)), ("b", None)).toDF("g", "v")
    val out = Profile.shape(df, Seq("g"), "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 3L, "b" -> 1L))
  }
}
