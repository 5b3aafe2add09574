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

  /** The mergeable sketch: distinct (keys…, bucket, m) rows. Null
    * values drop (COUNT DISTINCT convention). `m` must be a power of
    * two (the u/m division is then exact in double) and rides along as
    * a column, so a sketch is self-describing: [[estimate]] reads m
    * from the rows instead of trusting a caller-repeated parameter —
    * the silent-mismatch hazard is structurally gone. */
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
          .as("bucket") :+ lit(m.toLong).as("m"): _*)
      .distinct()
  }

  /** Per-group occupied-bucket count and quantized estimate from a
    * [[sketch]] or ANY DataFrame union of sketches built with the same
    * m/salt: `countDistinct(bucket)` makes duplicate (keys, bucket)
    * rows from overlapping shards harmless (a plain union keeps them),
    * and m comes from the sketch itself — a union that mixes different
    * m fails loudly instead of estimating garbage.
    * Output: (keys…, m, d, est) — d exact, est null iff saturated.
    * The est product is DECIMAL(10,0)·DECIMAL(18,9) = scale 9, whose
    * integer numerator stays < 2^53, so the decimal→double recovery is
    * exact cross-engine (a scale-18 product would double-round in
    * DuckDB's int128→double path). */
  def estimate(sk: DataFrame, keys: Seq[String]): DataFrame = {
    sk.groupBy(keys.map(col): _*)
      .agg(countDistinct(col("bucket")).as("d"),
        min(col("m")).as("__mlo"), max(col("m")).as("__mhi"))
      .withColumn("m",
        when(col("__mlo") === col("__mhi"), col("__mlo"))
          .otherwise(raise_error(concat(
            lit("LinearCount.estimate: union mixes sketches of different m: "),
            col("__mlo"), lit(" vs "), col("__mhi"))).cast("long")))
      .withColumn("est",
        when(col("d") < col("m"),
          (-col("m").cast(DecimalType(10, 0))) *
            log((col("m") - col("d")).cast("double") /
                col("m").cast("double"))
              .cast(DecimalType(18, 9)))
          .cast("double"))
      .select((keys.map(col) :+ col("m") :+ col("d") :+ col("est")): _*)
  }

  /** One-shot: sketch then estimate. */
  def distinctEstimate(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      m: Int = 4096,
      salt: String = "lc"): DataFrame =
    estimate(sketch(df, keys, valueCol, m, salt), keys)
}
