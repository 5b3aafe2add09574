package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Scale design: brute-force cosine top-k is the exact baseline — O(n·m)
  * pairs via a broadcast of the (small) query side, each pair a pure
  * column-expression fold, no UDF. The LSH variant buckets by
  * random-hyperplane signatures first so candidate generation is
  * O(n·bands) shuffle instead of O(n²) — the 100 TB path where the probe
  * side is also huge. Hyperplane components come from a deterministic LCG
  * (no RNG state), so results are reproducible and oracle-replayable.
  */
object Similarity {

  /** Left-fold dot product over double-cast elements: bit-deterministic
    * (fixed order, no SIMD/tree reassociation). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Exact top-k cosine neighbors for every vector of `queries` among
    * `corpus` (both with (`idCol`, `vecCol`)). The queries side is
    * broadcast; ranking uses a deterministic (−cos, neighbor id)
    * tie-break. Self-pairs are excluded.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 3): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nvec"))
    val q = queries.select(col(idCol).as("vec_id"), col(vecCol).as("qvec"))
    val pairs = c.join(broadcast(q), col("vec_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qvec"), col("nvec")))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    pairs
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("vec_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane p, dim i):
    * LCG over p·dim+i, scaled to (−0.5, 0.5). */
  def planeComponent(p: Int, i: Int, dims: Int): Double = {
    val x = (1103515245L * (p.toLong * dims + i) + 12345L) % 2147483648L
    x.toDouble / 2147483648.0 - 0.5
  }

  /** Random-hyperplane signature: bit p = sign(v · plane_p). Returns a
    * long column (up to 63 planes).
    */
  def hyperplaneSignature(vec: Column, planes: Int, dims: Int): Column = {
    val bits = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(vec,
          array((0 until dims).map(i => lit(planeComponent(p, i, dims))): _*),
          (x, w) => x.cast("double") * w),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** LSH-bucketed approximate top-k: vectors sharing a hyperplane-signature
    * band become candidates; exact cosine ranks within candidates. Probes
    * `bands` bands of `rowsPerBand` bits each.
    */
  def lshTopK(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Int,
      k: Int = 3,
      bands: Int = 4,
      rowsPerBand: Int = 4): DataFrame = {
    val planes = bands * rowsPerBand
    val sig = corpus.select(
      col(idCol).as("id"), col(vecCol).as("vec"),
      hyperplaneSignature(col(vecCol), planes, dims).as("sig"))
    val banded = sig.select(col("id"), col("vec"),
      posexplode(array((0 until bands).map { b =>
        // band value = bits [b*rowsPerBand, (b+1)*rowsPerBand)
        (shiftrightunsigned(col("sig"), b * rowsPerBand) %
          (1L << rowsPerBand)).cast("long")
      }: _*)))
      .select(col("id"), col("vec"), col("pos").as("band"), col("col").as("bucket"))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") &&
        col("x.bucket") === col("y.bucket") &&
        col("x.id") =!= col("y.id"))
      .select(col("x.id").as("vec_id"), col("x.vec").as("qvec"),
        col("y.id").as("neighbor_id"), col("y.vec").as("nvec"))
      .distinct()
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    cand
      .withColumn("cos", cosine(col("qvec"), col("nvec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("vec_id"), col("rank"), col("neighbor_id"), col("cos"))
  }
}
