package graft.text

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Bucket in [0, 100) derived from the row id and a salt. */
  def hashBucket(id: Column, salt: String): Column =
    polyHash(concat(id.cast("string"), lit(":" + salt))) % 100

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
