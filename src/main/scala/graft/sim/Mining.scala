package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.GroupedTopK

/** Contrastive-pair mining for embedding-model training: for each anchor
  * vector, emit its top positives (near-duplicates, cosine ≥ tPos) and
  * its top HARD negatives — vectors semantically close enough to confuse
  * the model (cosine in [hardLo, hardHi)) but below the duplicate bar.
  * Random negatives are easy to generate and easy to learn; the hard
  * band is where contrastive gradients come from (the in-batch-negatives
  * literature's "hard negative mining" step as a corpus operator).
  *
  * Candidate generation is cell-bounded like [[SemDedup]]: pairs are
  * examined only within a `cellBits`-plane hyperplane cell, so the
  * quadratic comparison is bounded by (n/2^cellBits)² per cell and the
  * miss rate is the documented p^cellBits (p = 1 − arccos(t)/π). That
  * bias is the right one here: hard negatives NEED to be nearby in
  * embedding space, which is exactly what sharing a cell selects for.
  *
  * One self-join on the cell key, cosine evaluated once per candidate
  * pair (native CosineSim kernel), one kind tag, then a single
  * per-(anchor, kind) top-k on the native GroupedTopK operator — heap
  * per group, spill-safe, one exchange. Nothing corpus-sized broadcasts.
  */
object Mining {

  /** @param tPos    cosine at/above which a pair is a positive
    * @param hardLo  inclusive lower cosine bound of the hard-negative band
    * @param hardHi  exclusive upper bound (≤ tPos; pairs in [hardHi, tPos)
    *                are mined as neither — a deliberate margin gap)
    * @param k       pairs kept per (anchor, kind), hardest (highest
    *                cosine) first, id as the deterministic tie-break
    * Output: (anchor_id, kind, pair_id, cos), kind ∈ {pos, hard_neg}.
    */
  def contrastivePairs(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Int,
      tPos: Double,
      hardLo: Double,
      hardHi: Double,
      cellBits: Int = 4,
      k: Int = 3): DataFrame = {
    require(hardLo < hardHi && hardHi <= tPos,
      s"need hardLo < hardHi <= tPos, got [$hardLo, $hardHi) vs $tPos")
    val v = vectors.select(col(idCol).as("anchor_id"), col(vecCol).as("vec"))
      .withColumn("cell",
        Similarity.hyperplaneSignature(col("vec"), cellBits, dims))
    // explicit side aliases: a self-join condition written with the
    // parent frames' column refs (v("cell") === b("cell")) resolves only
    // through Spark's dataset-id disambiguation heuristic (it logs
    // "Constructing trivially true equals predicate" first) — the
    // aliased form is unambiguous by construction. The cell kernel still
    // re-evaluates once per side (same trade as SemDedup: a handful of
    // planes, cheaper than materializing payloads)
    val pairs = v.as("a").join(v.as("b"),
        col("a.cell") === col("b.cell") &&
          col("a.anchor_id") =!= col("b.anchor_id"))
      .select(col("a.anchor_id").as("anchor_id"),
        col("b.anchor_id").as("pair_id"),
        Similarity.cosine(col("a.vec"), col("b.vec")).as("cos"))
      .where(col("cos") >= lit(math.min(hardLo, tPos)))
      .withColumn("kind",
        when(col("cos") >= lit(tPos), lit("pos"))
          .when(col("cos") < lit(hardHi), lit("hard_neg")))
      .where(col("kind").isNotNull)
    GroupedTopK.topKPerKey(pairs,
      keyCols = Seq("anchor_id", "kind"),
      order = Seq(("cos", false), ("pair_id", true)),
      k = k)
      .select("anchor_id", "kind", "pair_id", "cos")
  }
}
