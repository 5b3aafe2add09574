package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.PolyHash

/** Linear-counting distinct estimator (Whang et al. 1990) — the
  * approximate-COUNT-DISTINCT sketch chosen for determinism: the
  * sketch is the SET of occupied hash buckets, so unlike HLL register
  * internals it is hash-exact across engines (an oracle can replay
  * `count(distinct hash(v) % m)` verbatim) AND trivially mergeable —
  * union of occupied-bucket sets ≡ sketch of the union, which is what
  * lets 1000 shards sketch independently and combine without touching
  * the data again.
  *
  * Estimate: n̂ = −m·ln(u/m) where u = m − d is the unoccupied-bucket
  * count. `u/m` is exact in double for power-of-two m; ln's last ulp is
  * not cross-engine portable, so the published estimate is the
  * DECIMAL(18,9)-quantized term times the integer m — the Drift/BM25
  * discipline for transcendental outputs. A saturated sketch (d = m)
  * has no finite estimate and yields null — pick m ≳ distinct/ln(...)
  * big enough that saturation is impossible (classical guidance:
  * load factor d/m ≲ 12 still estimates within ~1%).
  *
  * Scale shape: one scan → one (keys, bucket) distinct exchange of
  * ids-only rows bounded by |groups|·m — sketch-sized regardless of
  * corpus size — then a per-group count. No data-row shuffle survives
  * past the first aggregation.
  */
object LinearCount {

  /** The mergeable sketch: distinct (keys…, bucket) rows. Null values
    * drop (COUNT DISTINCT convention). `m` must be a power of two (the
    * u/m division is then exact in double). */
  def sketch(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      m: Int = 4096,
      salt: String = "lc"): DataFrame = {
    require(m >= 2 && (m & (m - 1)) == 0, s"m must be a power of two: $m")
    df.where(col(valueCol).isNotNull)
      .select(keys.map(col) :+
        pmod(PolyHash.saltedHash(col(valueCol), salt), lit(m.toLong))
          .as("bucket"): _*)
      .distinct()
  }

  /** Per-group occupied-bucket count and quantized estimate from a
    * [[sketch]] (or any union of sketches built with the same m/salt).
    * Output: (keys…, d, est) — d exact, est null iff saturated. */
  def estimate(sk: DataFrame, keys: Seq[String], m: Int): DataFrame = {
    require(m >= 2 && (m & (m - 1)) == 0, s"m must be a power of two: $m")
    sk.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("d"))
      .withColumn("est",
        when(col("d") < m,
          (-lit(m.toLong).cast(DecimalType(18, 9))) *
            log((lit(m.toLong) - col("d")).cast("double") / lit(m.toDouble))
              .cast(DecimalType(18, 9)))
          .cast("double"))
  }

  /** One-shot: sketch then estimate. */
  def distinctEstimate(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      m: Int = 4096,
      salt: String = "lc"): DataFrame =
    estimate(sketch(df, keys, valueCol, m, salt), keys, m)
}
