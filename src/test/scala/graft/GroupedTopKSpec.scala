package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{GroupedTopK, GroupedTopKExec}

class GroupedTopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native grouped top-k equals the window formulation on random data") {
    val rnd = new scala.util.Random(17)
    val df = (1 to 5000).map(_ =>
      (rnd.nextInt(40), rnd.nextInt(100000), rnd.nextDouble()))
      .toDF("k", "id", "v")
      .distinct()
      .repartition(7)
    val native = GroupedTopK.topKPerKey(
      df, Seq("k"), Seq("v" -> false, "id" -> true), k = 3)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"k").orderBy($"v".desc, $"id")
    val window = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(native === window)
    assert(native.size === 40 * 3)
  }

  test("grouped top-k handles fewer-than-k groups and plans a single shuffle") {
    val df = Seq((1, 10), (1, 20), (2, 5)).toDF("k", "v")
    val out = GroupedTopK.topKPerKey(df, Seq("k"), Seq("v" -> false), k = 5)
    assert(out.count() === 3) // groups smaller than k emit everything
    val plan = out.queryExecution.executedPlan
    assert(plan.toString.contains("GroupedTopKExec") ||
      plan.collectFirst { case e: GroupedTopKExec => e }.isDefined ||
      plan.toString.contains("GroupedTopK"), plan.toString)
  }
}
