package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Stats

/** Round-6: rank AUC (Mann–Whitney with average-rank ties) — the
  * per-score-count formulation against hand-computed pair counts. */
class RankAucSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def auc(rows: Seq[(String, Int, Int)]) =
    Stats.rankAuc(rows.toDF("g", "y", "s"), Seq("g"), col("y"), col("s"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2),
          r.getDecimal(3).longValueExact(),
          Option(r.get(4)).map(_.asInstanceOf[Double])))
      .toMap

  test("perfect separation -> 1.0; reversed -> 0.0") {
    val out = auc(Seq(
      ("hi", 1, 3), ("hi", 1, 4), ("hi", 0, 1), ("hi", 0, 2),
      ("lo", 0, 3), ("lo", 0, 4), ("lo", 1, 1), ("lo", 1, 2)))
    assert(out("hi") == ((2L, 2L, 8L, Some(1.0))))
    assert(out("lo") == ((2L, 2L, 0L, Some(0.0))))
  }

  test("all scores tied -> 0.5 via the half-credit term") {
    val out = auc(Seq(("g", 1, 7), ("g", 1, 7), ("g", 0, 7), ("g", 0, 7),
      ("g", 0, 7)))
    assert(out("g") == ((2L, 3L, 6L, Some(0.5))))
  }

  test("mixed ties: pos {1,3} vs neg {1,2} -> U = 2.5, auc 0.625") {
    val out = auc(Seq(("g", 1, 1), ("g", 1, 3), ("g", 0, 1), ("g", 0, 2)))
    assert(out("g") == ((2L, 2L, 5L, Some(0.625))))
  }

  test("single-class group reports counts with null auc") {
    val out = auc(Seq(("g", 1, 1), ("g", 1, 2)))
    assert(out("g") == ((2L, 0L, 0L, None)))
  }

  test("null score or label rows drop") {
    val df = Seq(
      (Some(1), Some(5)), (Some(0), Some(1)), (None, Some(9)), (Some(1), None))
      .toDF("y", "s").withColumn("g", lit("g"))
    val out = Stats.rankAuc(df, Seq("g"), col("y"), col("s")).collect()
    assert(out.head.getLong(1) == 1L && out.head.getLong(2) == 1L)
    assert(out.head.getAs[java.math.BigDecimal]("u2").longValueExact == 2L)
  }
}
