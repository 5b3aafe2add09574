package graft.operators
import graft.Materialize.MatOps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent-pair mining (market-basket co-occurrence with lift) — the
  * A-priori 2-itemset pass, shaped for scale:
  *
  *  - item supports aggregate FIRST, and the infrequent-item prune
  *    happens BEFORE any pair is generated (the A-priori property: a
  *    pair can only be frequent if both items are). The pair fan-out is
  *    then bounded by C(frequent-items-per-basket, 2), not
  *    C(items-per-basket, 2) — on a Zipf catalog this is the difference
  *    between a bounded explode and a quadratic one.
  *  - the frequent-item set is vocabulary-sized, so the prune and the
  *    two support re-attaches are broadcast joins; only the per-basket
  *    self-join shuffles, keyed on the basket id (each basket's items
  *    co-locate — pair generation is local within a partition).
  *  - the deduplicated (basket, item) table feeds four plan branches
  *    (supports, both self-join sides, the basket total), so it is
  *    materialized once with an eager localCheckpoint — ids-only rows,
  *    far smaller than the fact table they came from; without it the
  *    raw scan re-runs per branch (the q95 lesson).
  *  - lift is emitted as an exact scaled integer
  *    (`⌊10^6 · N · c_xy / (c_x · c_y)⌋`, DECIMAL(38,0) interior), so
  *    the result hash-compares across engines; consumers wanting the
  *    float divide by 10^6 themselves.
  *
  * A basket whose frequent-item count is extreme (a crawler account
  * buying the whole catalog) still fans out quadratically — that is
  * the documented A-priori cost; cap items per basket upstream (e.g.
  * [[graft.plans.GroupedTopK]]) when the domain allows it.
  */
object Basket {

  /** Frequent co-occurring item pairs with support and lift.
    *
    * @param baskets        rows holding (basket, item); duplicates fine
    *                       (multiplicity is ignored — presence counts)
    * @param basketCol      basket / transaction id column
    * @param itemCol        item column
    * @param minItemSupport items in fewer baskets are pruned pre-pairing
    * @param minPairSupport pairs in fewer baskets are dropped
    * @return (item_a, item_b, pair_support, supp_a, supp_b, lift_ppm)
    *         with item_a < item_b
    */
  def frequentPairs(
      baskets: DataFrame,
      basketCol: String,
      itemCol: String,
      minItemSupport: Long,
      minPairSupport: Long): DataFrame = {
    require(minItemSupport >= 1 && minPairSupport >= 1,
      "supports must be >= 1")
    val items = baskets
      .where(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .distinct()
      .materialize()
    val totals = items.agg(countDistinct(col("__b")).as("n_baskets"))
    val supp = items.groupBy(col("__i")).agg(count(lit(1)).as("__supp"))
      .where(col("__supp") >= minItemSupport)
    // A-priori prune before pairing; supp is vocabulary-sized → broadcast.
    val frequent = items.join(broadcast(supp), "__i")
      .select(col("__b"), col("__i"))
    val a = frequent.select(col("__b"), col("__i").as("item_a"))
    val b = frequent.select(col("__b"), col("__i").as("item_b"))
    val pairs = a.join(b, Seq("__b")).where(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("pair_support"))
      .where(col("pair_support") >= minPairSupport)
    val sa = supp.select(col("__i").as("item_a"), col("__supp").as("supp_a"))
    val sb = supp.select(col("__i").as("item_b"), col("__supp").as("supp_b"))
    pairs.join(broadcast(sa), "item_a").join(broadcast(sb), "item_b")
      .crossJoin(broadcast(totals))
      .withColumn("lift_ppm", expr(
        """CAST((CAST(1000000 AS DECIMAL(38,0)) * n_baskets * pair_support)
          |     div (CAST(supp_a AS DECIMAL(38,0)) * supp_b) AS BIGINT)
          |""".stripMargin))
      .select(col("item_a"), col("item_b"), col("pair_support"),
        col("supp_a"), col("supp_b"), col("lift_ppm"))
  }
}
