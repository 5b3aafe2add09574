package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.SketchExprs

/** Round-8: the integer/double native kernels that replaced the
  * interpreted `aggregate(zip_with(...))` lambda folds (q344/q335/
  * q183/q184/q164/q230 family) must be BIT-IDENTICAL to the
  * declarative formulations — and the multi-cum globalRankCums must
  * equal the single-cum calls it generalizes.
  */
class NativeKernelsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rows = Seq(
    (Array(1L, -2L, 3L, 0L), Array(4L, 5L, -6L, 2L)),
    (Array(0L, 0L, 0L, 0L), Array(0L, 0L, 0L, 0L)),
    (Array(1000L, -1000L, 999L, -999L), Array(-1000L, 1000L, -999L, 999L)))

  test("SqEuclideanLong / DotLong / ArrayAgreeCount equal the lambda folds") {
    val df = rows.toDF("a", "b")
    val got = df.select(
      SketchExprs.sqEuclideanLong(col("a"), col("b")).as("d2"),
      SketchExprs.dotLong(col("a"), col("b")).as("dot"),
      SketchExprs.arrayAgreeCount(col("a"), col("b")).as("agree"))
    val exp = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, v) => acc + v).as("d2"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0L), (acc, v) => acc + v).as("dot"),
      aggregate(zip_with(col("a"), col("b"),
          (x, y) => when(x === y, 1L).otherwise(0L)),
        lit(0L), (acc, v) => acc + v).as("agree"))
    assert(got.collect().toSeq == exp.collect().toSeq)
  }

  test("SqEuclideanLong reads INT element arrays (the int8-quant face)") {
    val df = Seq((Array(1, 2, -3), Array(4, -5, 6))).toDF("a", "b")
    val got = df.select(SketchExprs.sqEuclideanLong(col("a"), col("b")))
      .as[Long].head()
    assert(got == 9L + 49L + 81L)
  }

  test("DotDouble replays the exact left-fold IEEE sequence on floats") {
    val df = Seq((Array(0.1f, 0.2f, 0.3f), Array(0.7f, 0.11f, 0.13f)))
      .toDF("a", "b")
    val got = df.select(SketchExprs.dotDouble(col("a"), col("b")))
      .as[Double].head()
    val exp = df.select(
      aggregate(zip_with(col("a"), col("b"),
          (x, y) => x.cast("double") * y.cast("double")),
        lit(0d), (acc, v) => acc + v)).as[Double].head()
    assert(java.lang.Double.doubleToLongBits(got) ==
      java.lang.Double.doubleToLongBits(exp))
  }

  test("globalRankCums: two cum columns in one pass equal two single calls") {
    val df = Seq((1L, 10L, 2L, 100L), (2L, 25L, 3L, 50L), (3L, 7L, 1L, 10L),
      (4L, 18L, 5L, 20L), (5L, 25L, 2L, 1L))
      .toDF("id", "v", "c1", "c2")
      .selectExpr("id", "v", "c1", "c2", "v div 10 AS b")
    val multi = dedup.SortedNeighborhood.globalRankCums(
        df, "id", "b", Seq("v"), Nil, Seq("c1", "c2"))
      .select(col("id"), col("__rank"), col("__cum_c1"), col("__cum_c2"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    def single(c: String): Map[Long, (Long, Long)] =
      dedup.SortedNeighborhood.globalRankCum(
          df, "id", "b", Seq("v"), Nil, Some(c))
        .select(col("id"), col("__rank"), col("__cum"))
        .as[(Long, Long, Long)].collect()
        .map(t => t._1 -> (t._2, t._3)).toMap
    val s1 = single("c1"); val s2 = single("c2")
    multi.foreach { case (id, r, cc1, cc2) =>
      assert(s1(id) == (r, cc1), s"id=$id c1")
      assert(s2(id) == (r, cc2), s"id=$id c2")
    }
    // and the naive global order agrees
    val naive = Seq((3L, 7L, 1L, 10L), (1L, 10L, 2L, 100L),
      (4L, 18L, 5L, 20L), (2L, 25L, 3L, 50L), (5L, 25L, 2L, 1L))
    var (r0, a1, a2) = (0L, 0L, 0L)
    naive.foreach { case (id, _, c1, c2) =>
      r0 += 1; a1 += c1; a2 += c2
      val m = multi.find(_._1 == id).get
      assert(m == ((id, r0, a1, a2)), s"naive id=$id")
    }
  }
}
