package graft.sim
import graft.Materialize.MatOps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANN quality evaluation — recall@k of an approximate neighbor list
  * against exact ground truth. At 100 TB the ANN index (LSH / IVF / PQ)
  * is the only affordable retrieval path, and its recall on a sampled
  * query set is the number that decides whether its parameters (bands,
  * probes, codebook size) are safe to ship; this operator turns that
  * check into a relational join instead of a driver-side script.
  *
  * Scale shape: both inputs are (query, neighbor) id pairs — k rows per
  * query — so everything here is ids-only and tiny relative to the
  * corpus: an inner join on the pair key counts hits, a left join back
  * to the per-query truth counts keeps queries the ANN missed entirely
  * (recall 0), and recall = hits/k is an exact int/int division.
  */
object AnnEval {

  /** Per-query recall of `approx` against `truth`, both (queryCol,
    * neighborCol) pair tables (extra columns ignored). `k` is the
    * ground-truth list size — queries whose truth list is shorter (end
    * of a small corpus) divide by their actual truth count instead, so
    * recall stays in [0, 1]. Output: (queryCol, n_truth, hits, recall).
    */
  def recallAtK(
      truth: DataFrame,
      approx: DataFrame,
      queryCol: String,
      neighborCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"recallAtK needs k >= 1, got $k")
    // stage boundary: truth is an expensive retrieval subtree referenced
    // by TWO branches below (the per-query counts and the hit join) —
    // materialize its k-rows-per-query pair list once instead of
    // re-running the retrieval per branch. approx feeds exactly one
    // join, so its lineage already runs once: no checkpoint.
    val t = truth.select(col(queryCol), col(neighborCol)).materialize()
    val a = approx.select(col(queryCol), col(neighborCol)).distinct()
    val perQuery = t.groupBy(col(queryCol))
      .agg(count(lit(1)).as("n_truth"))
    val hits = t.join(a, Seq(queryCol, neighborCol), "left_semi")
      .groupBy(col(queryCol))
      .agg(count(lit(1)).as("hits"))
    perQuery.join(hits, Seq(queryCol), "left")
      .select(
        col(queryCol),
        col("n_truth"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        (coalesce(col("hits"), lit(0L)).cast("double") /
          least(col("n_truth"), lit(k.toLong)).cast("double")).as("recall"))
  }
}
