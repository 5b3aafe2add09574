package graft.text
import graft.Materialize.MatOps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.PolyHash.polyHash

/** Deterministic hash-mod sampling — the reproducible sampling practice
  * for large corpora: membership depends only on (id, salt), never on
  * partitioning, executor count, or RNG state, so samples are stable
  * across runs, clusters, and engines (the oracle replays them exactly).
  * Spark's `sample()`/`sampleBy()` seed per-partition RNGs and silently
  * resample under repartitioning — unusable for reproducible corpus
  * splits.
  */
object Sampling {

  /** Bucket in [0, buckets) derived from the row id and a salt — THE
    * membership recipe every sampler here (and its oracle SQL) replays;
    * keep it in one place so the hash/salt scheme cannot fork. Built on
    * the double-fold [[graft.functions.PolyHash.saltedHash]] so that
    * resampling under a new salt is an independent-looking draw, not a
    * constant bucket rotation (see its scaladoc for why one fold fails).
    */
  def hashBucket(id: Column, salt: String, buckets: Int = 100): Column =
    graft.functions.PolyHash.saltedHash(id, salt) % buckets

  /** Keep ~pct% of rows, deterministically. */
  def hashSample(df: DataFrame, idCol: String, pct: Int, salt: String): DataFrame =
    df.filter(hashBucket(col(idCol), salt) < pct)

  /** Disjoint deterministic train/validation/test split. */
  def split(df: DataFrame, idCol: String, trainPct: Int, valPct: Int,
      salt: String): (DataFrame, DataFrame, DataFrame) = {
    val b = hashBucket(col(idCol), salt)
    (df.filter(b < trainPct),
      df.filter(b >= trainPct && b < trainPct + valPct),
      df.filter(b >= trainPct + valPct))
  }

  /** Temperature-scaled mixture rates — the published multilingual
    * sampling practice (sample stratum l with probability ∝ p_l^α,
    * α < 1 upweights low-resource strata): per-stratum keep rates in
    * permille, normalized so the rarest stratum keeps everything.
    * r_l = p_l^(α-1) / max_m p_m^(α-1); the Σ p^α normalizer cancels in
    * the ratio, so no cross-engine transcendental SUM is needed — only
    * pow and one division in the same op order (bit-portable; see the
    * q66 oracle). Output: (stratum, n_docs, keep_permille,
    * expected_docs), all integers but the implicit pow.
    *
    * Scale shape: one pass over the corpus (the tiny per-stratum count
    * table is localCheckpoint'd and feeds both the max and the join);
    * applying the rates is hashBucket-style mod-sampling as in
    * [[stratifiedHashSample]].
    */
  def temperatureMixture(df: DataFrame, stratumCol: String,
      alpha: Double): DataFrame = {
    val counts = df.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n_docs")).materialize()
    val total = counts.agg(sum(col("n_docs")).as("total"))
    val w = counts.crossJoin(broadcast(total))
      .withColumn("w",
        pow(col("n_docs").cast("double") / col("total"), lit(alpha - 1.0)))
    val mw = w.agg(max(col("w")).as("mw"))
    w.crossJoin(broadcast(mw))
      .withColumn("keep_permille",
        floor(lit(1000.0) * (col("w") / col("mw"))).cast("long"))
      .select(col(stratumCol), col("n_docs"), col("keep_permille"),
        expr("(n_docs * keep_permille) div 1000").as("expected_docs"))
  }

  /** Apply [[temperatureMixture]] rates to the corpus — the end of the
    * mixture pipeline: the tiny per-stratum rate table joins back via
    * broadcast and membership is the deterministic permille hash-mod
    * `hash(id:salt) % 1000 < keep_permille`. Scan-stage filter, no
    * shuffle; same reproducibility contract as [[hashSample]]. */
  def applyMixture(df: DataFrame, idCol: String, stratumCol: String,
      rates: DataFrame, salt: String): DataFrame = {
    val kp = rates.select(col(stratumCol), col("keep_permille"))
    df.join(broadcast(kp), Seq(stratumCol))
      .filter(hashBucket(col(idCol), salt, buckets = 1000) < col("keep_permille"))
      .drop("keep_permille")
  }

  /** Cluster-balanced subsample — diversity-preserving selection (the
    * SemDeDup/SSL-prototypes curation step AFTER dedup): keep at most
    * `perCell` rows from every cell of a precomputed partition of the
    * space (embedding hash cells, topic clusters, source buckets…),
    * chosen by a deterministic salted hash with id tie-break. A plain
    * hash-mod sample keeps the cluster-size skew it was given; this one
    * flattens it — big clusters cap at `perCell`, small ones survive
    * whole, so rare modes are never crowded out of the sample.
    *
    * Runs on the native GroupedTopK physical operator: per-key bounded
    * heaps, no full sort, spill-safe — one shuffle on the cell key.
    *
    * The pick is [[graft.functions.PolyHash.saltedHash]] — the
    * double-fold matters doubly here, because a bare polyHash over a
    * short `id:salt` string never wraps the modulus and "top-k by
    * hash" silently degenerates to "k smallest ids" for every salt.
    */
  def cellBalancedSample(
      df: DataFrame, idCol: String, cellCol: String,
      perCell: Int, salt: String): DataFrame = {
    val withPick = df.withColumn("pick",
      graft.functions.PolyHash.saltedHash(col(idCol), salt))
    graft.plans.GroupedTopK.topKPerKey(
      withPick,
      keyCols = Seq(cellCol),
      order = Seq("pick" -> true, idCol -> true),
      k = perCell)
  }

  /** Weighted sampling WITHOUT replacement — Efraimidis–Spirakis
    * (Inf. Proc. Letters 97(5), 2006): give row i the key
    * u_i^(1/w_i) with u_i uniform in (0,1) and keep the k largest
    * keys; the selection distribution is exactly weighted sampling
    * without replacement. Here u_i is the deterministic
    * [[graft.functions.PolyHash.saltedHash]] scaled into (0,1)
    * ((h + 0.5) / mod — never exactly 0 or 1, so every key is finite
    * and weight-sensitive), which keeps the whole sample reproducible
    * across runs, partitionings, and engines: pow is the only
    * transcendental and both engines evaluate it in the same op order
    * (the q66 precedent).
    *
    * Scale shape: scan-stage key computation, then a global top-k via
    * orderBy + limit — Spark plans TakeOrderedAndProject (per-partition
    * bounded heaps merged on the driver, k rows of driver memory), NOT
    * a full sort. Rows with weight ≤ 0 or null are excluded, matching
    * the method's domain.
    *
    * Output: input columns + `es_key`, the selection key (descending =
    * selection order — the first k survive any later truncation).
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int, salt: String): DataFrame = {
    require(k >= 1, s"weighted sample needs k >= 1, got $k")
    val mod = graft.functions.PolyHash.DefaultMod
    val u = (graft.functions.PolyHash.saltedHash(col(idCol), salt)
      .cast("double") + lit(0.5)) / lit(mod.toDouble)
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("es_key", pow(u, lit(1.0) / col(weightCol).cast("double")))
      .orderBy(col("es_key").desc, col(idCol))
      .limit(k)
  }

  /** Leakage-free train/validation/test split: hash the near-dup
    * CLUSTER representative, not the row id, so near-duplicate
    * documents can never straddle a split boundary — the eval-set
    * contamination a plain [[split]] silently commits whenever the
    * corpus still contains near-dups (it almost always does; exact
    * dedup does not catch paraphrases). `clusters` is the
    * (id, cluster_id) labeling from
    * [[graft.dedup.Dedup.nearDupClusters]] — rows absent from it are
    * singletons and hash their own id; every clustered row hashes its
    * cluster label (the cluster's min id), so the whole cluster lands
    * in one split.
    *
    * Scale shape: one equi-join against the cluster labeling (itself
    * ids-only and typically far smaller than the corpus — only docs
    * with at least one near-dup appear), then a scan-stage hash; no
    * other exchange. Output: input columns + (rep_id, bucket, split).
    */
  def clusterSplit(
      df: DataFrame, idCol: String, clusters: DataFrame,
      trainPct: Int, valPct: Int, salt: String): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      s"bad split percentages train=$trainPct val=$valPct")
    val lbl = clusters.select(col("doc_id").as(idCol),
      col("cluster_id").as("__cluster"))
    val b = hashBucket(col("rep_id"), salt)
    df.join(lbl, Seq(idCol), "left")
      .withColumn("rep_id", coalesce(col("__cluster"), col(idCol)))
      .drop("__cluster")
      .withColumn("bucket", b)
      .withColumn("split",
        when(col("bucket") < trainPct, lit("train"))
          .when(col("bucket") < trainPct + valPct, lit("val"))
          .otherwise(lit("test")))
  }

  /** Token-budget selection — greedy data curation under a budget:
    * rank rows by (`scoreCol` desc, `idCol` asc) and keep the longest
    * prefix whose running `tokenCol` sum stays ≤ `budget` (token counts
    * are positive, so the kept set IS a prefix). The naive plan is a
    * GLOBAL ordered cumulative sum — a single-partition window that
    * serializes the whole corpus through one task. Here the classic
    * two-phase prefix sum makes it scale:
    *
    *   1. quantize the score into `floor(score · bucketScale)` integer
    *      buckets (monotone, so bucket-major order == score order);
    *   2. aggregate per-bucket token sums (a `bucketScale`-sized table)
    *      and window THAT to get each bucket's starting offset;
    *   3. buckets whose offset already exceeds the budget are dropped
    *      before any sort — the bulk of the corpus never shuffles;
    *   4. the survivors get offset + a within-bucket cumulative sum
    *      (windows partitioned BY BUCKET run in parallel), and the
    *      row-level filter `cum ≤ budget` lands exactly the greedy
    *      prefix.
    *
    * `bucketScale` trades the offset-table size against per-bucket
    * window skew: all rows of one bucket sort within one partition, so
    * scale it to the score's resolution (1000 for a [0,1] quality
    * score). Rows with null/non-positive token counts are excluded
    * (they cannot consume budget and would break the prefix argument).
    *
    * Output: input columns + (score_bucket, cum_tokens), cum_tokens
    * strictly increasing in selection order.
    */
  def budgetSelect(
      df: DataFrame, idCol: String, tokenCol: String, scoreCol: String,
      budget: Long, bucketScale: Int = 1000): DataFrame = {
    require(budget >= 1, s"budgetSelect needs budget >= 1, got $budget")
    require(bucketScale >= 1, s"bucketScale must be >= 1, got $bucketScale")
    val rows = df
      .filter(col(tokenCol).isNotNull && col(tokenCol) > 0)
      .withColumn("score_bucket",
        floor(col(scoreCol) * lit(bucketScale.toDouble)).cast("long"))
    // stage boundary: the tiny per-bucket sum table feeds the offset
    // window and the join back
    val perBucket = rows.groupBy(col("score_bucket"))
      .agg(sum(col(tokenCol)).as("__bsum"))
      .materialize()
    val wOff = Window.orderBy(col("score_bucket").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = perBucket
      .withColumn("__offset", coalesce(sum(col("__bsum")).over(wOff), lit(0L)))
      // bucket-level prune: a bucket starting at or past the budget
      // cannot contribute a row (token counts are >= 1)
      .where(col("__offset") < budget)
      .select(col("score_bucket"), col("__offset"))
    val wIn = Window.partitionBy(col("score_bucket"))
      .orderBy(col(scoreCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rows
      .join(broadcast(offsets), Seq("score_bucket"))
      .withColumn("cum_tokens", col("__offset") + sum(col(tokenCol)).over(wIn))
      .where(col("cum_tokens") <= budget)
      .drop("__offset")
  }

  /** Sampled-aggregate accuracy report: per group, the EXACT count and
    * sum next to the `pct`%-hash-sample scaled estimates and their
    * signed errors — the calibration table that tells you whether the
    * cheap estimator is good enough before you point it at 100 TB
    * (where the exact pass is the expensive one and this report, run
    * once on a slice, is the evidence). Deterministic sample (salted
    * hash, not RNG), integer arithmetic throughout: `pct` must divide
    * 100 so the scale factor is an exact integer.
    *
    * Scale shape: one scan feeds both aggregates (conditional sums on
    * the bucket predicate — the sample is a filter inside the same
    * partial aggregation, not a second pass), one group-by exchange.
    * Output: (keys…, exact_n, exact_sum, est_n, est_sum, err_n,
    * err_sum). */
  def sampleEstimate(
      df: DataFrame, keys: Seq[String], idCol: String, valueCol: String,
      pct: Int, salt: String): DataFrame = {
    require(pct >= 1 && pct <= 100 && 100 % pct == 0,
      s"pct must divide 100: $pct")
    val scale = (100 / pct).toLong
    val inSample = hashBucket(col(idCol), salt) < pct
    df.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("exact_n"),
        sum(col(valueCol)).cast("long").as("exact_sum"),
        (count(when(inSample, lit(1))) * scale).as("est_n"),
        (coalesce(sum(when(inSample, col(valueCol))), lit(0L)) * scale)
          .cast("long").as("est_sum"))
      .withColumn("err_n", col("est_n") - col("exact_n"))
      .withColumn("err_sum", col("est_sum") - col("exact_sum"))
  }

  /** Water-filling caps over a count dim: the exact level L such that
    * Σ min(n, L) fits a `budgetNum/budgetDen` fraction of the total —
    * the "rate-limit the mega-sources, keep the small ones whole"
    * mixture rule. With the dim sorted ascending, used(L) is linear on
    * each interval [n_{i−1}, n_i): prefix_{i−1} + (m−i+1)·L, so the
    * level is the unique row whose candidate
    * (budget − prefix_{i−1}) div (m−i+1) lands inside its own
    * interval; when the budget covers the whole total no row is valid
    * and every key keeps its full count (the coalesce path). All
    * integer arithmetic; the search is window prefix sums over the
    * DIM, never the corpus. Output: keyCols + nCol + `cap`. */
  def waterFillCaps(
      counts: DataFrame, keyCols: Seq[String], nCol: String,
      budgetNum: Long, budgetDen: Long): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    require(budgetNum >= 0 && budgetDen > 0,
      s"budget fraction must be >= 0: $budgetNum/$budgetDen")
    val wDim = Window.partitionBy()
    val wOrd = Window.orderBy(col(nCol) +: keyCols.map(col): _*)
    val level = counts
      .withColumn("__i", row_number().over(wOrd))
      .withColumn("__m", count(lit(1)).over(wDim))
      .withColumn("__tot", sum(col(nCol)).over(wDim))
      .withColumn("__pfx", coalesce(sum(col(nCol)).over(
        wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__lo",
        coalesce(lag(col(nCol), 1).over(wOrd), lit(0L)))
      .select(
        expr(s"((__tot * $budgetNum) div $budgetDen - __pfx)" +
          " div (__m - __i + 1)").as("__lvl"),
        col("__lo"), col(nCol).as("__hi"))
      .where(col("__lvl") >= col("__lo") && col("__lvl") < col("__hi"))
      .agg(min(col("__lvl")).as("__lvl"))
    counts.crossJoin(broadcast(level))
      .select(keyCols.map(col) :+ col(nCol) :+
        least(col(nCol), coalesce(col("__lvl"), col(nCol))).as("cap"): _*)
  }

  /** Stratified variant: per-stratum keep-percentages (e.g. language
    * rebalancing), unmatched strata keep `defaultPct`. */
  def stratifiedHashSample(
      df: DataFrame, idCol: String, stratumCol: String,
      pcts: Map[String, Int], defaultPct: Int, salt: String): DataFrame = {
    val pctCol = pcts.foldLeft(lit(defaultPct)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol), salt) < pctCol)
  }
}
