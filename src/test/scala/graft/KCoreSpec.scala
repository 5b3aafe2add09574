package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.KCore

/** Round-6: k-core peeling — cascade removal, convergence, clique
  * survival, the chain-vs-triangle distinction. */
class KCoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def core(edges: Seq[(Long, Long)], k: Int, rounds: Int = 6) =
    KCore.kCorePeel(edges.toDF("a", "b"), "a", "b", k, rounds)
      .as[(Long, Long)].collect().toMap

  test("a triangle survives the 2-core; a pendant chain peels away") {
    // triangle 1-2-3 plus chain 3-4-5: 5 peels (deg 1), then 4.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    assert(core(edges, 2) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("a pure chain has an empty 2-core") {
    assert(core(Seq((1L, 2L), (2L, 3L), (3L, 4L)), 2).isEmpty)
  }

  test("cascading removal needs multiple rounds and converges") {
    // path hung off a triangle: each round exposes the next pendant.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L))
    val r = core(edges, 2, rounds = 6)
    assert(r == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // and fewer rounds than the cascade depth is NOT converged:
    assert(core(edges, 2, rounds = 1).size > 3)
  }

  test("k=3: a 4-clique survives, a triangle does not") {
    val clique4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val edges = clique4 ++ Seq((10L, 11L), (11L, 12L), (10L, 12L))
    val r = core(edges, 3)
    assert(r.keySet == Set(1L, 2L, 3L, 4L))
    assert(r.values.forall(_ == 3L))
  }
}
