package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.SupplierGraph

/** The shared budget/BFS helpers behind the budgeted graph audits
  * (q473/q656/q658): exact distances on a known graph, component-local
  * behavior on a disconnected one, the exhaustion tripwire, and the
  * deterministic budget pick. */
class SupplierGraphOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // path 1-2-3-4-5 plus isolated pair 10-11: known distances,
  // disconnected, diameter 4 in the big component
  private def ed = {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("a", "c")
    e.unionAll(e.select(col("c").as("a"), col("a").as("c")))
      .select(col("a").as("ea"), col("c").as("ec"))
  }

  test("bfsFrom returns exact min distances within components") {
    val srcs = Seq(1L, 10L).toDF("src")
    val reach = SupplierGraph.bfsFrom(ed, srcs, maxHops = 4,
        assertExhausted = true)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(reach((1L, 5L)) == 4L)
    assert(reach((1L, 3L)) == 2L)
    assert(reach((10L, 11L)) == 1L)
    // component-local: source 1 never reaches the 10-11 pair
    assert(!reach.contains((1L, 10L)))
    assert(reach.size == 5 + 2) // 5 nodes from src 1, 2 from src 10
  }

  test("exhaustion assert trips when the cap truncates a distance") {
    val srcs = Seq(1L).toDF("src")
    // the size-gated twin raises the contract violation INSIDE its
    // single task, so Spark surfaces it wrapped — assert the loud
    // failure by message anywhere in the cause chain, branch-agnostic
    val err = intercept[Exception] {
      SupplierGraph.bfsFrom(ed, srcs, maxHops = 3, assertExhausted = true)
    }
    val msgs = Iterator.iterate[Throwable](err)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .toSeq
    assert(msgs.exists(_.contains("beyond the 3-hop cap")))
    // without the assert the capped walk is legal (reach-size metric)
    val reach = SupplierGraph.bfsFrom(ed, srcs, maxHops = 3)
    assert(reach.count() == 4) // nodes 1..4; node 5 beyond the cap
  }

  test("budgetSources picks hubs first and dedupes the spread overlap") {
    // star at 1 (degree 4) — hub pick must lead with it
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("a", "c")
    val adj = star.unionAll(star.select(col("c").as("a"), col("a").as("c")))
      .select(col("a").as("ea"), col("c").as("ec"))
    val hubOnly = SupplierGraph.budgetSources(adj, nHubs = 1, nSpread = 0)
      .as[Long].collect()
    assert(hubOnly.toSeq == Seq(1L))
    val all = SupplierGraph.budgetSources(adj, nHubs = 5, nSpread = 5)
      .as[Long].collect()
    assert(all.sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L)) // deduped union
  }
}
