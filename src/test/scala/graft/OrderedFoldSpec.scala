package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.OrderedFold

class OrderedFoldSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val outSchema = StructType(Seq(
    StructField("k", IntegerType, nullable = false),
    StructField("acc", LongType, nullable = false)))

  private def runFold(rows: Seq[(Int, Int, Long)], parts: Int): Map[Int, Long] = {
    val df = rows.toDF("k", "ord", "v").repartition(parts)
    OrderedFold.foldGroups[Long](
      df, Seq("k"), Seq(col("ord")), outSchema)(
      init = _ => 0L,
      step = (acc, r) => acc * 31L + r.getLong(2),
      emit = (key, acc) => Iterator(
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](key.getInt(0), acc))))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
  }

  private def expected(rows: Seq[(Int, Int, Long)]): Map[Int, Long] =
    rows.groupBy(_._1).map { case (k, rs) =>
      k -> rs.sortBy(_._2).map(_._3).foldLeft(0L)((a, v) => a * 31L + v)
    }

  test("fold equals sequential per-key fold regardless of input partitioning") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 6) {
      val n = rnd.nextInt(120)
      // index as the order column -> (k, ord) unique, expected order total
      val rows = (0 until n).map(i => (rnd.nextInt(6), i, rnd.nextLong(100)))
      val parts = 1 + rnd.nextInt(6)
      assert(runFold(rows, parts) === expected(rows), s"trial $trial n=$n parts=$parts")
    }
  }

  test("scanGroups: per-row running state resets at group boundaries, any partitioning") {
    val scanSchema = StructType(Seq(
      StructField("k", IntegerType, nullable = false),
      StructField("ord", IntegerType, nullable = false),
      StructField("running", LongType, nullable = false)))
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 4) {
      val n = 1 + rnd.nextInt(100)
      val rows = (0 until n).map(i => (rnd.nextInt(4), i, rnd.nextLong(50)))
      val parts = 1 + rnd.nextInt(5)
      val got = OrderedFold.scanGroups[Long](
        rows.toDF("k", "ord", "v").repartition(parts),
        Seq("k"), Seq(col("ord")), scanSchema)(
        init = () => 0L,
        step = (acc, r) => {
          val next = acc + r.getLong(2)
          (next, new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](r.getInt(0), r.getInt(1), next)))
        })
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
      val want = rows.groupBy(_._1).flatMap { case (k, rs) =>
        rs.sortBy(_._2).scanLeft((k, -1, 0L)) { case ((_, _, acc), (_, o, v)) =>
          (k, o, acc + v)
        }.drop(1).map { case (kk, o, acc) => (kk, o) -> acc }
      }
      assert(got === want)
    }
  }

  test("salted aggregation equals direct groupBy on skewed keys") {
    import graft.operators.Relational
    // 90% of rows share one key — the skew scenario salting exists for
    val rows = (1 to 2000).map(i => (if (i % 10 == 0) i % 7 else 99, i.toLong))
    val df = rows.toDF("k", "v")
    val direct = df.groupBy($"k")
      .agg(count(lit(1)).as("cnt"), sum($"v").as("sum_v"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val salted = Relational.saltedCountSum(df, Seq("k"), Seq("v"), saltBuckets = 8)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(salted === direct)
  }

  test("empty input emits nothing") {
    assert(runFold(Seq.empty, parts = 3).isEmpty)
  }

  test("single-row groups emit once") {
    val rows = Seq((1, 0, 7L), (2, 1, 9L))
    assert(runFold(rows, parts = 4) === Map(1 -> 7L, 2 -> 9L))
  }
}
