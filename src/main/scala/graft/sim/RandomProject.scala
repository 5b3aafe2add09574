package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Johnson–Lindenstrauss random projection with a DETERMINISTIC sign
  * matrix — the 4× (64→16) dimensionality squeeze an ANN index applies
  * before sharding 100 TB of embeddings: dot products (hence cosines)
  * are approximately preserved, storage and per-candidate scoring cost
  * drop proportionally, and because the matrix derives from the repo's
  * salted hash (not an RNG), every engine — and every re-run — builds
  * the SAME projection. ±1 signs (Achlioptas) rather than Gaussians:
  * the JL guarantee holds, and the projection stays integer-exact.
  *
  * Exactness: inputs quantize to milli-integers (⌊1000·x_i⌋ — the
  * float→double cast and the ×1000 are bit-identical IEEE in any
  * engine), the projection is then y_j = Σ_i s_ij·x_i over literal ±1
  * arrays — pure integer arithmetic, hash-comparable output.
  *
  * Scale shape: scan-stage only — zero exchanges; the sign matrix is
  * outDims literal arrays compiled into the plan (inDims·outDims ≤ a
  * few thousand literals), never a join side.
  */
object RandomProject {

  /** The ±1 sign for matrix cell (i, j) under `salt` — the same
    * double-fold salted hash the SQL oracle states (PolyHash applied
    * twice, decimal re-stringification between). */
  def sign(i: Int, j: Int, salt: String): Int = {
    val m = graft.functions.PolyHash.DefaultMod
    val inner = graft.functions.PolyHashImpl.hash(
      UTF8String.fromString(s"$i,$j:$salt"), 131L, m)
    val outer = graft.functions.PolyHashImpl.hash(
      UTF8String.fromString(s"$salt:$inner"), 131L, m)
    if (outer % 2 == 0) 1 else -1
  }

  /** Milli-quantized projection: (input columns…, proj) with
    * proj[j] = Σ_i sign(i,j)·⌊1000·vec[i]⌋, j in [0, outDims). */
  def projectMilli(
      df: DataFrame,
      vecCol: Column,
      inDims: Int,
      outDims: Int,
      salt: String): DataFrame = {
    require(inDims >= 1 && outDims >= 1 && outDims <= inDims,
      s"need 1 <= outDims <= inDims: $inDims -> $outDims")
    val q = transform(vecCol,
      v => floor(v.cast("double") * lit(1000d)).cast("long"))
    val comps = (0 until outDims).map { j =>
      val signs = array((0 until inDims).map(i =>
        lit(sign(i, j, salt).toLong)): _*)
      // native integer dot kernel — exact in any order, one virtual
      // call per output dim instead of an interpreted per-element fold
      graft.functions.SketchExprs.dotLong(q, signs)
    }
    df.withColumn("proj", array(comps: _*))
  }
}
