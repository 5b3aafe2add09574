package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.TextRank

/** Round-6: personalized PageRank — seed-restricted teleport, zero
  * mass in seedless components, seed filtering. */
class PprSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], seeds: Seq[Long], iters: Int = 4) = {
    val e = edges.toDF("a", "b")
    val sym = e.select(col("a").as("src"), col("b").as("dst"),
        lit(1L).as("w"))
      .unionByName(e.select(col("b").as("src"), col("a").as("dst"),
        lit(1L).as("w")))
    TextRank.personalizedPageRank(sym, "src", "dst", "w",
        seeds.toDF("node"), "node", iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("a component without seeds ends at rank zero") {
    val out = run(Seq(1L -> 2L, 10L -> 11L), seeds = Seq(1L))
    assert(out(10L) == 0L && out(11L) == 0L)
    assert(out(1L) > 0L && out(2L) > 0L)
  }

  test("mass concentrates near the seed") {
    // path 1-2-3-4 seeded at 1: rank decays with distance
    val out = run(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L), seeds = Seq(1L))
    assert(out(1L) > out(3L))
    assert(out(2L) > out(4L))
  }

  test("seeds not present in the graph are ignored for S") {
    // same graph, seed sets {1} and {1, 999}: identical ranks
    val a = run(Seq(1L -> 2L), seeds = Seq(1L))
    val b = run(Seq(1L -> 2L), seeds = Seq(1L, 999L))
    assert(a == b)
  }

  test("all-seed PPR equals uniform-teleport PageRank") {
    val e = Seq(1L -> 2L, 2L -> 3L, 1L -> 3L)
    val sym = e.toDF("a", "b")
      .select(col("a").as("src"), col("b").as("dst"), lit(1L).as("w"))
      .unionByName(e.toDF("a", "b")
        .select(col("b").as("src"), col("a").as("dst"), lit(1L).as("w")))
    val ppr = TextRank.personalizedPageRank(sym, "src", "dst", "w",
        Seq(1L, 2L, 3L).toDF("node"), "node", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pr = TextRank.pageRank(sym, "src", "dst", "w", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ppr == pr)
  }

  test("an empty effective seed set fails loudly") {
    intercept[IllegalArgumentException] {
      run(Seq(1L -> 2L), seeds = Seq(999L))
    }
  }
}
