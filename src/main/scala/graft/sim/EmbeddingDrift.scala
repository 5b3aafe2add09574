package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Embedding-space drift between two corpus snapshots — the vector
  * sibling of the PSI gate (text/Drift): per stratum, the cosine
  * between the OLD and NEW centroid directions. A centroid that swings
  * (cos well below 1) means the embedding distribution moved — a model
  * change, an ingest shift, or a poisoned source — caught without any
  * pairwise computation.
  *
  * Exactness: components quantize to fixed-point integers
  * (floor(x·scale)) at the scan, per-(stratum, dim) sums are exact
  * decimal integer sums, and cosine-of-centroids = cosine-of-SUMS
  * (scale-invariant), so no mean division ever happens; the one
  * floating step is the final dot/√·√ over exactly-recovered doubles
  * (keep scale so per-dim sums stay < 2^53/dims — the default 10^3 on
  * unit-normalized embeddings holds to ~10^10 rows per stratum).
  *
  * Scale shape: each side is one scan → one (stratum, dim) partial-
  * aggregated exchange bounded by |strata|·dims — sketch-sized — then
  * a dims-sized join and a per-stratum fold. Row counts ride along in
  * the same aggregates.
  */
object EmbeddingDrift {

  /** Per-stratum centroid cosine between snapshots `a` and `b`.
    * Output: (keyCol, n_a, n_b, dot, na2, nb2, cos) with the integer
    * columns exact and cos null if either side's centroid is zero. */
  def centroidDrift(
      a: DataFrame,
      b: DataFrame,
      keyCol: String,
      vecCol: String,
      dims: Int,
      scale: Int = 1000): DataFrame = {
    require(dims >= 1 && scale >= 1, s"need dims/scale >= 1: $dims/$scale")
    val d38 = DecimalType(38, 0)
    def side(df: DataFrame, tag: String): DataFrame = df
      .select(col(keyCol).as("__k"), posexplode(col(vecCol)))
      .select(col("__k"), col("pos").as("__dim"),
        floor(col("col").cast("double") * scale).cast("long").as("__q"))
      .groupBy(col("__k"), col("__dim"))
      .agg(sum(col("__q")).cast(d38).as(s"__s_$tag"),
        count(lit(1)).as(s"__n_$tag"))
    val sa = side(a, "a")
    val sb = side(b, "b")
    sa.join(sb, Seq("__k", "__dim"))
      .groupBy(col("__k"))
      .agg(
        max(col("__n_a")).as("n_a"), max(col("__n_b")).as("n_b"),
        sum(col("__s_a") * col("__s_b")).cast(d38).as("__dot"),
        sum(col("__s_a") * col("__s_a")).cast(d38).as("__na2"),
        sum(col("__s_b") * col("__s_b")).cast(d38).as("__nb2"))
      .withColumn("dot", col("__dot").cast("long"))
      .withColumn("na2", col("__na2").cast("long"))
      .withColumn("nb2", col("__nb2").cast("long"))
      .withColumn("cos",
        when(col("na2") > 0 && col("nb2") > 0,
          col("dot").cast("double") /
            (sqrt(col("na2").cast("double")) *
              sqrt(col("nb2").cast("double")))))
      .select(col("__k").as(keyCol), col("n_a"), col("n_b"),
        col("dot"), col("na2"), col("nb2"), col("cos"))
  }
}
