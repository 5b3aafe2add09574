package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 tail: MLlib surface beyond the classifier stack — frequent
  * itemsets (FPGrowth vs exact brute force) and implicit-feedback ALS
  * (structure recovery on a planted block pattern). */
class MlExtrasSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("FPGrowth finds exactly the brute-force frequent itemsets") {
    val baskets = Seq(
      Seq("a", "b", "c"), Seq("a", "b"), Seq("a", "c"),
      Seq("a", "b", "c"), Seq("b", "c"), Seq("a"))
    val df = baskets.toDF("items")
    val minSupport = 0.5 // count >= 3 of 6
    val model = new org.apache.spark.ml.fpm.FPGrowth()
      .setItemsCol("items").setMinSupport(minSupport)
      .setMinConfidence(0.5)
      .fit(df)
    val got = model.freqItemsets
      .select(array_join(array_sort(col("items")), ","), col("freq"))
      .as[(String, Long)].collect().toMap
    // brute force over the tiny lattice
    val n = baskets.size
    val all = baskets.flatMap(_.toSet.subsets().filter(_.nonEmpty))
      .groupBy(identity).map { case (s, occ) => s -> occ.size.toLong }
      .filter { case (_, c) => c >= math.ceil(minSupport * n) }
      .map { case (s, c) => s.toSeq.sorted.mkString(",") -> c }
    assert(got == all)
    // and the planted rule a->b has the expected exact confidence 3/5
    val conf = model.associationRules
      .where(array_join(col("antecedent"), ",") === "a" &&
        array_join(col("consequent"), ",") === "b")
      .select(col("confidence")).as[Double].collect()
    assert(conf.headOption.contains(3.0 / 5.0))
  }

  test("implicit ALS recovers a planted block structure") {
    // users 0-4 interact with items 0-4, users 5-9 with items 5-9 —
    // recommendations must stay inside the user's block
    val ratings = (for {
      u <- 0 until 10
      i <- 0 until 10
      if (u < 5) == (i < 5)
      if (u + i) % 3 != 0 // leave holes so there is something to rank
    } yield (u, i, 1.0f)).toDF("user", "item", "rating")
    val model = new org.apache.spark.ml.recommendation.ALS()
      .setUserCol("user").setItemCol("item").setRatingCol("rating")
      .setImplicitPrefs(true).setRank(4).setMaxIter(8).setSeed(42L)
      .fit(ratings)
    model.setColdStartStrategy("drop")
    val recs = model.recommendForAllUsers(3)
      .select(col("user"), col("recommendations.item").as("items"))
      .as[(Int, Seq[Int])].collect().toMap
    assert(recs.size == 10)
    recs.foreach { case (u, items) =>
      assert(items.size == 3)
      val inBlock = items.count(i => (u < 5) == (i < 5))
      assert(inBlock >= 2, s"user $u recommended mostly out-of-block: $items")
    }
  }
}
