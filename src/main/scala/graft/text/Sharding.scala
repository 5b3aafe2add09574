package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.PolyHash.polyHash

/** Deterministic global corpus shuffle + sharding — the epoch-ordering
  * stage of a training pipeline: every document gets a shard and a
  * position within that shard, derived ONLY from (id, salt), so the
  * training order is reproducible across runs, clusters, and engines and
  * re-shuffling an epoch is just a new salt. `df.orderBy(rand())` has
  * neither property (per-partition RNG state, resampled on any replan),
  * and a single global sort of 100 TB is the plan this operator exists
  * to avoid.
  *
  * Scale shape: ONE shuffle, keyed by the shard hash, then an external
  * sort within each shard — no total order across shards is ever
  * materialized (a data loader consumes shard files independently, the
  * canonical large-corpus layout). Shard assignment and within-shard
  * order use INDEPENDENTLY salted hashes, so shard membership tells you
  * nothing about position. Size `nShards` well above the executor count
  * so each shard's sort fits an executor (at 100 TB, thousands of
  * shards of a few GB each); the window's per-shard sort spills via
  * UnsafeExternalSorter rather than OOM when it doesn't.
  */
object Sharding {

  /** Attach (`shard`, `pos`): shard = hash(id:salt:shard) mod nShards,
    * pos = 1-based rank of hash(id:salt:ord) (id tie-break) within the
    * shard. Output order is unspecified (orderBy downstream if needed);
    * values are independent of input partitioning.
    */
  def shuffleShards(
      df: DataFrame,
      idCol: String,
      nShards: Int,
      salt: String): DataFrame = {
    require(nShards >= 1, s"nShards=$nShards must be positive")
    // Double-fold saltedHash, NOT a bare salted polyHash: one fold is
    // linear, so "epoch2" would be a near-constant additive shift of
    // "epoch1" — a rotation of the same training order, not a fresh
    // shuffle (see PolyHash.saltedHash). The two hashes stay
    // independently salted so shard membership says nothing about pos.
    val id = col(idCol)
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("ord_key"), col(idCol))
    df.withColumn("shard",
        graft.functions.PolyHash.saltedHash(id, s"$salt:shard") % nShards)
      .withColumn("ord_key",
        graft.functions.PolyHash.saltedHash(id, s"$salt:ord"))
      .withColumn("pos", row_number().over(w))
      .drop("ord_key")
  }
}
