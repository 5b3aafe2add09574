package graft.sim
import graft.Materialize.MatOps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication (Abbas et al. 2023, "SemDeDup:
  * Data-efficient learning at web-scale through semantic deduplication"):
  * bound the quadratic embedding-similarity comparison by a coarse
  * partition of embedding space, then prune ONLY within each cell.
  * Cross-cell near-duplicates are deliberately never examined — that
  * acceptance of a bounded miss rate is the method's entire efficiency
  * claim (the paper partitions with k-means; here the cell is the
  * deterministic `cellBits`-plane hyperplane sign pattern so the oracle
  * can replay the assignment bit-exactly, same LCG planes as
  * [[Similarity.ivfHashTopK]]).
  *
  * Scale shape: one shuffle of (id, vec, cell) on the cell key, then an
  * intra-cell self-join — expected per-cell pair cost (n/2^cellBits)²,
  * driven down quadratically by raising cellBits as the corpus grows.
  * The loser set is ids-only through the distinct and the anti-join.
  * Nothing broadcasts except the loser id set if AQE chooses to.
  *
  * Recall honesty: a pair at cosine t lands in the same cell with
  * probability p^cellBits, p = 1 − arccos(t)/π — e.g. t = 0.95 ⇒ p ≈ 0.90
  * ⇒ ~53% at 6 bits. SemDeDup's k-means cells co-locate semantic
  * neighborhoods far more reliably than independent hyperplanes; when the
  * corpus needs high pairwise recall instead of cheap bulk pruning, use
  * [[Similarity.cosineNearDupPairsBanded]] (multi-band, 1−(1−p^r)^B
  * recall) and cluster with [[graft.dedup.Dedup.nearDupClusters]].
  */
object SemDedup {

  /** Survivors of cell-bounded semantic dedup: a vector is dropped iff
    * SOME lower-id vector in the SAME cell has cosine ≥ threshold with
    * it. This is the one-pass parallel keep rule (drop against all lower
    * ids, not just surviving ones): deterministic, partitioning-
    * independent, and strictly at-least-as-aggressive as iterative
    * leader election — a chain a~b, b~c (a≁c) drops BOTH b and c, where
    * sequential election would re-admit c after b's removal. Documented
    * contract, replayed exactly by the DuckDB oracle (q75).
    *
    * Output: (id, cell) of survivors.
    */
  def semanticDedup(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Int,
      threshold: Double,
      cellBits: Int = 6): DataFrame = {
    require(cellBits >= 1 && cellBits <= 62, s"cellBits=$cellBits out of range")
    // stage boundary: (id, vec, cell) feeds three plan branches (a-side,
    // b-side, survivor base). Without materialization each branch re-runs
    // the corpus scan + cell kernel from the source — 3 corpus reads for
    // one dedup pass, the cost axis that dominates at scale (the kernel
    // re-eval itself is cheap; the repeated SCAN is not). localCheckpoint
    // lands the rows once on executor-local storage; the trade is that a
    // lost executor fails the query instead of recomputing its lineage —
    // acceptable for a batch pass (rerun), decisive against re-reading
    // a 100 TB corpus once per branch.
    val v = vectors.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("cell",
        Similarity.hyperplaneSignature(col("vec"), cellBits, dims))
      .materialize()
    val losers = v.as("a").join(v.as("b"),
        col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
      .filter(Similarity.cosine(col("a.vec"), col("b.vec")) >= threshold)
      .select(col("b.id").as("id"))
      .distinct()
    v.join(losers, Seq("id"), "left_anti")
      .select(col("id"), col("cell"))
  }

  /** Banded variant — recall-CONFIGURABLE semantic dedup for when the
    * single-cell miss rate is not acceptable: a vector is dropped iff a
    * lower-id vector sharing ANY of the B band buckets sits at cosine ≥
    * threshold. Pair recall at cosine t is 1 − (1 − p^r)^B (p = 1 −
    * arccos(t)/π) versus the single-cell variant's p^cellBits — at
    * t = 0.9 the 15×4 default recovers ≈ 99.99% of pairs where 6 single
    * cell bits keep ~39%. Cost: bucket rows replicate B×, and candidate
    * verification rides [[Similarity.cosineNearDupPairsBanded]]'s
    * distinct-candidates + exact-cosine path (ids-only shuffles, bucket
    * cap as the skew guard). Same one-pass keep rule as
    * [[semanticDedup]]; output is the survivor id set.
    */
  def semanticDedupBanded(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Int,
      threshold: Double,
      bands: Int = 15,
      rowsPerBand: Int = 4,
      maxBucketSize: Int = 4096): DataFrame = {
    val losers = Similarity.cosineNearDupPairsBanded(vectors, idCol, vecCol,
      threshold, dims, bands, rowsPerBand, maxBucketSize)
      .select(col("id_b").as("id"))
      .distinct()
    // the survivor base re-reads only the id column (columnar pruning
    // makes this scan ids-only); the vector payloads are scanned once,
    // inside cosineNearDupPairsBanded's checkpointed input
    vectors.select(col(idCol).as("id"))
      .join(losers, Seq("id"), "left_anti")
  }
}
