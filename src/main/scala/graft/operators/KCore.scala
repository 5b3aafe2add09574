package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps

/** k-core peeling (Seidman 1983) — iteratively remove nodes of degree
  * < k until the k-core (the maximal subgraph where every node keeps ≥
  * k neighbors) remains. The graph-robustness filter for similarity
  * graphs: near-dup PAIRS flag duplicates, but the 2-core isolates the
  * densely-templated clusters (boilerplate families, mirror farms)
  * that pairwise counting understates.
  *
  * Deterministic fixed-round formulation: `rounds` synchronous peels
  * (every round recomputes degrees and drops all sub-k nodes at once —
  * the standard parallel peel), which an oracle replays as literally
  * the same chain of round CTEs; convergence within `rounds` makes the
  * output THE k-core, and the round count needed is the graph's
  * degeneracy depth (tiny for similarity graphs — peeling cascades,
  * it does not iterate linearly).
  *
  * Scale shape: per round, one degree aggregation (partial-combined,
  * node-sized), one node-sized materialized alive-set, and two
  * semi-joins back onto the edge list — edges only ever shrink, and
  * each round's edge table materializes so the plan stays
  * constant-depth (the TextRank/CC checkpoint-per-round discipline;
  * lineage would otherwise double per round).
  */
object KCore {

  /** Peel `rounds` times toward the k-core of the undirected graph
    * given as UNIQUE edges (srcCol, dstCol) with src ≠ dst. Output:
    * (node, deg) for every node still carrying an edge after the last
    * round, with deg its degree in the surviving subgraph. */
  def kCorePeel(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      k: Int,
      rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1, s"need k >= 1, rounds >= 1: $k, $rounds")
    var e = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
    def degrees(ed: DataFrame): DataFrame =
      ed.select(col("a").as("node"))
        .unionByName(ed.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
    for (_ <- 1 to rounds) {
      val alive = degrees(e).where(col("deg") >= k)
        .select("node").materialize()
      e = e
        .join(alive.withColumnRenamed("node", "a"), Seq("a"), "leftsemi")
        .join(alive.withColumnRenamed("node", "b"), Seq("b"), "leftsemi")
        .select("a", "b")
        .materialize()
    }
    degrees(e)
  }
}
