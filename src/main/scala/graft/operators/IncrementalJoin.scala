package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental join maintenance — the view-maintenance identity for
  * insert-only deltas, the join-shaped sibling of
  * [[IncrementalAgg]]:
  *
  *   (A ∪ dA) ⋈ (B ∪ dB)  =  A⋈B  ∪  dA⋈B  ∪  A⋈dB  ∪  dA⋈dB
  *
  * so a maintained join view advances by computing only the three
  * delta terms. The scale argument is why warehouses bother: every
  * delta term joins at most ONE corpus-sized side, with the delta on
  * the other — small enough to broadcast — so the nightly update never
  * re-shuffles the big tables against each other. Re-computing A⋈B
  * from scratch is the thing this replaces: a full co-shuffle of both
  * sides per run.
  *
  * Insert-only is the contract (same as [[IncrementalAgg]]): updates
  * and deletes need retraction terms this operator does not emit.
  */
object IncrementalJoin {

  /** The rows `dA` and `dB` ADD to `A ⋈ B` (inner equi-join on
    * `aKey = bKey`): `dA⋈B ∪ A⋈dB ∪ dA⋈dB`. Column names across the
    * two sides must be disjoint; output columns are A's then B's,
    * like the plain join. Pass the deltas broadcast-hinted when their
    * size is known-small; here each term is left to Catalyst/AQE,
    * which broadcasts the under-threshold side on its own.
    */
  def deltaInner(
      aOld: DataFrame,
      aDelta: DataFrame,
      bOld: DataFrame,
      bDelta: DataFrame,
      aKey: String,
      bKey: String): DataFrame = {
    val overlap = aOld.columns.toSet.intersect(bOld.columns.toSet)
    require(overlap.isEmpty, s"column names must be disjoint: $overlap")
    def j(a: DataFrame, b: DataFrame) =
      a.join(b, col(aKey) === col(bKey))
    j(aDelta, bOld).unionByName(j(aOld, bDelta)).unionByName(j(aDelta, bDelta))
  }

  /** The maintained view after the batch: `oldJoin ∪ deltaInner(...)`.
    * `oldJoin` is whatever the previous run materialized (a parquet
    * dataset in practice); equivalence with the from-scratch join is
    * the spec's and q117's pinned property.
    */
  def maintained(
      oldJoin: DataFrame,
      aOld: DataFrame,
      aDelta: DataFrame,
      bOld: DataFrame,
      bDelta: DataFrame,
      aKey: String,
      bKey: String): DataFrame =
    oldJoin.unionByName(
      deltaInner(aOld, aDelta, bOld, bDelta, aKey, bKey))
}
