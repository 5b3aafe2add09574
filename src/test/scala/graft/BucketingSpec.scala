package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Bucketing = the co-located join path for repeated large-large joins at
  * scale: both sides pre-hashed into the same bucket layout, so the join
  * needs NO exchange at read time. This spec pins that the plan is
  * actually shuffle-free (the 100 TB design claim, testable at any size).
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed tables join without a shuffle exchange") {
    import spark.implicits._
    val games = (1 to 500).map(i => (i % 40, 2024, i * 2)).toDF("TeamID", "Season", "Points")
    val stats = (0 until 40).map(i => (i, 2024, i / 40.0)).toDF("TeamID", "Season", "WinRate")
    games.write.mode("overwrite").bucketBy(8, "TeamID").sortBy("TeamID")
      .saveAsTable("g_bucketed")
    stats.write.mode("overwrite").bucketBy(8, "TeamID").sortBy("TeamID")
      .saveAsTable("s_bucketed")
    // disable broadcast so the join strategy is decided by partitioning
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("g_bucketed")
        .join(spark.table("s_bucketed"), Seq("TeamID"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected shuffle-free bucketed join, got:\n$plan")
      assert(joined.count() === 500)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS g_bucketed")
      spark.sql("DROP TABLE IF EXISTS s_bucketed")
    }
  }
}
