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

  /** Curriculum interleave — a training order that mixes difficulty
    * levels evenly instead of front-loading one regime: rows bucket by
    * `floor(score · bucketScale)`, rank within their bucket by a salted
    * hash (id tie-break), and the emitted `interleave_key =
    * rank_in_bucket · (bucketScale + 1) + bucket` is a TOTAL order that
    * round-robins across buckets (first one row of every difficulty
    * bucket, then the second of every bucket, …). Consumers sort their
    * shard files by the key; no global row number — and therefore no
    * global sort or single-partition window — is ever computed: the one
    * window is partitioned by bucket (parallel, spill-safe), and the
    * key is scan-stage arithmetic on top of it. Reproducibility is the
    * [[Sampling]] contract: order depends only on (id, salt).
    *
    * `scoreCol` must land in [0, 1] (quality scores do); `bucketScale`
    * sets how many difficulty levels interleave.
    */
  def curriculumInterleave(
      df: DataFrame,
      idCol: String,
      scoreCol: String,
      bucketScale: Int,
      salt: String): DataFrame = {
    require(bucketScale >= 1, s"bucketScale=$bucketScale must be positive")
    val bucket = floor(col(scoreCol) * lit(bucketScale.toDouble)).cast("long")
    val w = Window.partitionBy(col("difficulty_bucket"))
      .orderBy(col("ord_key"), col(idCol))
    df.withColumn("difficulty_bucket", bucket)
      .withColumn("ord_key",
        graft.functions.PolyHash.saltedHash(col(idCol), s"$salt:cur"))
      .withColumn("rank_in_bucket", row_number().over(w).cast("long"))
      .withColumn("interleave_key",
        col("rank_in_bucket") * lit(bucketScale + 1L) + col("difficulty_bucket"))
      .drop("ord_key")
  }

  /** Rendezvous (highest-random-weight) shard assignment — the STABLE
    * alternative to [[shuffleShards]]'s hash-mod: each (id, shard)
    * pair gets an independent salted-hash weight and the id goes to
    * the argmax shard. Growing nShards → nShards+1 moves ONLY the ids
    * whose new shard wins its weight draw — an expected 1/(nShards+1)
    * of the corpus — where hash-mod reshuffles nearly everything. That
    * stability is what incremental re-sharding, cache affinity, and
    * consistent writer assignment want at 100 TB (re-shard = rewrite
    * one new shard's worth of data, not the corpus).
    *
    * Output: input columns + (shard, w) — w the winning 31-bit weight,
    * kept so downstream can audit the draw. Ties (hash collisions
    * across shards) break toward the smaller shard id,
    * deterministically. Scale shape: an nShards-way row explode
    * immediately reduced by a partial-aggregated max — the exchange
    * carries one row per id, never the fan-out.
    */
  def rendezvousAssign(
      df: DataFrame,
      idCol: String,
      nShards: Int,
      salt: String): DataFrame = {
    require(nShards >= 1, s"nShards=$nShards must be positive")
    val w = graft.functions.PolyHash.saltedHash(
      concat(col(idCol).cast("string"), lit("#"), col("__s").cast("string")),
      s"$salt:hrw")
    val winners = df
      .select(col(idCol), explode(sequence(lit(0), lit(nShards - 1)))
        .as("__s"))
      .withColumn("__w", w)
      .groupBy(col(idCol))
      .agg(max(struct(col("__w"), (-col("__s")).as("__negs"))).as("__win"))
      .select(col(idCol), (-col("__win.__negs")).cast("long").as("shard"),
        col("__win.__w").as("w"))
    df.join(winners, idCol)
  }

  /** [[rendezvousAssign]] over an explicit NODE-LABEL set — the form
    * operations actually run: nodes have names, and a failover removes
    * one from the middle of the set (integer-shard HRW can only shrink
    * from the end). Winner = highest hash, ties to the smallest label.
    * Removing a node moves EXACTLY that node's keys (every other key's
    * per-node hashes, and therefore its argmax, are unchanged) — the
    * minimal-movement property q228 pins against the oracle. Labels
    * must not contain '#' (the id#node separator would be ambiguous).
    * Output: df columns + `node` + `w`. */
  def rendezvousAssignNodes(
      df: DataFrame,
      idCol: String,
      nodes: Seq[String],
      salt: String): DataFrame = {
    require(nodes.nonEmpty && nodes.distinct.size == nodes.size,
      s"nodes must be non-empty and distinct: $nodes")
    require(nodes.forall(!_.contains("#")),
      s"node labels must not contain '#': $nodes")
    val w = graft.functions.PolyHash.saltedHash(
      concat(col(idCol).cast("string"), lit("#"), col("__node")),
      s"$salt:hrw")
    val scored = df
      .select(col(idCol),
        explode(array(nodes.map(lit): _*)).as("__node"))
      .withColumn("__w", w)
    // two id-keyed reductions instead of one struct-max: the tiebreak
    // wants the SMALLEST label at the HIGHEST hash, and strings can't
    // be order-negated inside a struct max. The best-hash side is
    // renamed outright before the self-join (column-reference
    // disambiguation on derived frames silently degenerates).
    val best = scored.groupBy(col(idCol)).agg(max(col("__w")).as("__bw"))
      .withColumnRenamed(idCol, "__bid")
    val winners = scored
      .join(best, col(idCol) === col("__bid") && col("__w") === col("__bw"))
      .groupBy(col(idCol))
      .agg(min(col("__node")).as("node"), min(col("__w")).as("w"))
    df.join(winners, idCol)
  }
}
