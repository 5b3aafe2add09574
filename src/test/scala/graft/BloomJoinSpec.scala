package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.BloomJoin

/** Round-5 wave 13: bloom-pruned semi/anti joins — exactness vs the
  * plain joins, and proof the bloom actually prunes pre-shuffle.
  */
class BloomJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val facts = (1L to 2000L).map(i => (i, i % 13))
    .toDF("fk", "payload")
  private lazy val dim = (1L to 2000L by 5).toDF("dk") // 400 keys, 20% hit

  private def keys(df: org.apache.spark.sql.DataFrame) =
    df.select("fk").as[Long].collect().sorted.toSeq

  test("semiPruned equals the plain semi-join at every fpp") {
    val plain = keys(facts.join(dim, $"fk" === $"dk", "left_semi"))
    for (fpp <- Seq(0.5, 0.01, 1e-6)) {
      assert(keys(BloomJoin.semiPruned(facts, "fk", dim, "dk", 400, fpp))
        == plain, s"fpp=$fpp")
    }
  }

  test("antiPruned equals the plain anti-join, null fact keys included") {
    val withNull = facts.unionByName(
      Seq((Option.empty[Long], 99L)).toDF("fk", "payload"))
    val plain = withNull.join(dim, $"fk" === $"dk", "left_anti")
      .select("payload").as[Long].collect().sorted.toSeq
    val pruned = BloomJoin.antiPruned(withNull, "fk", dim, "dk", 400)
      .select("payload").as[Long].collect().sorted.toSeq
    assert(pruned == plain)
    assert(pruned.contains(99L), "null key must survive the anti-join")
  }

  test("fact and dim key columns may share a name (star-schema norm)") {
    val dimSameName = dim.withColumnRenamed("dk", "fk")
    val plain = keys(facts.join(dim, $"fk" === $"dk", "left_semi"))
    assert(keys(BloomJoin.semiPruned(facts, "fk", dimSameName, "fk", 400))
      == plain)
    val anti = BloomJoin.antiPruned(facts, "fk", dimSameName, "fk", 400)
    assert(anti.count() ==
      facts.join(dim, $"fk" === $"dk", "left_anti").count())
  }

  test("an undersized bloom stays exact (only the fp rate degrades)") {
    val plain = keys(facts.join(dim, $"fk" === $"dk", "left_semi"))
    assert(keys(BloomJoin.semiPruned(facts, "fk", dim, "dk",
      expectedKeys = 3, fpp = 0.01)) == plain)
  }

  test("the bloom prunes definite misses before the exact join") {
    // disjoint key spaces at tight fpp: nearly every fact row is a
    // definite miss, so the exact join's input must be a sliver
    val far = (100000L to 100400L).toDF("dk")
    val pruned = facts.where(coalesce(
      graft.functions.SketchExprs.bloomMightContainLong(
        $"fk", {
          val b = far.stat.bloomFilter("dk", 401, 1e-6)
          val bos = new java.io.ByteArrayOutputStream()
          b.writeTo(bos); bos.toByteArray
        }), lit(false))).count()
    assert(pruned < 50, s"bloom let $pruned of 2000 misses through")
    // and the full operator returns the (empty) exact answer
    assert(BloomJoin.semiPruned(facts, "fk", far, "dk", 401, 1e-6)
      .count() == 0L)
  }
}
