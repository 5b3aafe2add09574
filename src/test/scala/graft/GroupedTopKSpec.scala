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

  test("overflow to the spilling sorter keeps results identical at high key cardinality") {
    val rnd = new scala.util.Random(23)
    // many more distinct keys than the overridden per-partition bound
    val df = (1 to 20000).map(i => (rnd.nextInt(5000), i, rnd.nextDouble()))
      .toDF("k", "id", "v")
      .repartition(4)
    val key = "spark.graft.topk.maxKeysPerPartition"
    val expected = GroupedTopK.topKPerKey(
      df, Seq("k"), Seq("v" -> false, "id" -> true), k = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    spark.conf.set(key, "64") // force every partition through the sorter path
    try {
      val spilled = GroupedTopK.topKPerKey(
        df, Seq("k"), Seq("v" -> false, "id" -> true), k = 2)
        .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      assert(spilled === expected)
      assert(spilled.nonEmpty)
    } finally spark.conf.unset(key)
  }

  test("k < 1 is rejected up front") {
    val df = Seq((1, 10)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      GroupedTopK.topKPerKey(df, Seq("k"), Seq("v" -> false), k = 0)
    }
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
