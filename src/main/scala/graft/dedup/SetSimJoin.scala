package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps

/** Exact set-similarity join via prefix filtering (PPJoin's core,
  * Xiao et al. 2008) — the COMPLETE counterpart to the LSH banding in
  * [[Dedup.nearDuplicatePairs]]: banding trades recall for speed (a
  * near-dup pair can miss every band), while the prefix filter is
  * lossless — two sets with Jaccard ≥ t MUST share an element within
  * each other's first `|s| − ⌈t·|s|⌉ + 1` elements under ANY agreed
  * global element order, so generating candidates only from prefixes
  * provably drops no qualifying pair. Use this when the dedup decision
  * must be exact (legal/contractual dedup, eval decontamination);
  * banding when approximate recall is acceptable.
  *
  * The global order is (document frequency ASC, element ASC): rarest
  * elements first. That is also the skew story — candidates are only
  * generated from PREFIX elements, and rarity-first ordering means a
  * hot element (appearing in half the corpus) only lands in a prefix
  * when a set has nothing rarer, so the per-element candidate lists
  * the equi-join fans out stay small by construction. Everything is
  * integer-exact: the threshold test is the cross-multiplied
  * `inter·100 ≥ t100·(|a|+|b|−inter)` — no float division.
  *
  * Scale shape: one explode for frequencies (vocabulary-sized agg),
  * one per-set sort (window-free: sort_array inside the row), a
  * prefix-only equi-join (ids+sizes shuffle, prefix-bounded fan-out),
  * a distinct on candidate pairs, and two id-keyed joins to fetch the
  * set arrays for the exact verify (array_intersect, codegen'd
  * row-wise — candidate-sized work, never all-pairs).
  */
object SetSimJoin {

  /** All pairs (a, b), a < b, with Jaccard(setA, setB) ≥ t100/100 over
    * the DISTINCT elements of `setCol` (an array column; duplicates
    * and nulls inside the array are dropped). Output: (a, b, inter,
    * uni) with inter/uni the exact intersection/union sizes. Empty
    * sets match nothing (Jaccard undefined). */
  /** Canonical per-set form shared by both joins: (id, elems sorted
    * rarity-first, n). Set-dim-sized and consumed by several branches,
    * so it materializes once.
    *
    * Elements travel as their ~62-bit content fingerprint, not the
    * string: every downstream shuffle (distinct, frequency join,
    * candidate equi-join) carries 8-byte keys instead of ~30-byte
    * shingle text, per-set sorting compares longs, and the verify's
    * array_intersect hashes longs — the exact-dedup fingerprint
    * discipline (q26) applied to set elements. Exactness contract:
    * distinct elements colliding on the fingerprint would merge; at
    * 2^62 the expected collision count is ~n²/2^63 — vanishing below
    * corpus scales where this operator is usable at all, and the
    * DuckDB oracle (which joins on the raw strings) would catch one. */
  private def canonicalSets(
      df: DataFrame, idCol: String, setCol: String): DataFrame = {
    val elems = df
      .select(col(idCol).as("__id"), explode(col(setCol)).as("__e0"))
      .where(col("__e0").isNotNull)
      .select(col("__id"), Dedup.contentFingerprint(col("__e0")).as("__e"))
      .distinct()
    val freq = elems.groupBy("__e").agg(count(lit(1)).as("__df"))
    // Rarity-first canonical order, realized per set as one in-row
    // sort_array over (df, elem) structs — no window, no global sort.
    elems.join(freq, "__e")
      .groupBy("__id")
      .agg(sort_array(collect_list(struct(col("__df"), col("__e"))))
        .as("__se"))
      .select(col("__id"),
        expr("transform(__se, x -> x.__e)").as("__elems"),
        size(col("__se")).cast("long").as("__n"))
      .materialize()
  }

  /** Prefix probes: one row per (id, element, 1-based position) over
    * the first `n − ⌈t·n⌉ + 1` elements of each canonical set. */
  private def prefixProbes(sorted: DataFrame, t100: Int): DataFrame =
    sorted.withColumn("__p",
        expr(s"__n - (($t100 * __n + 99) div 100) + 1"))
      .select(col("__id"), col("__n"),
        posexplode(expr("slice(__elems, 1, greatest(cast(__p as int), 0))")))
      .withColumnRenamed("col", "__e")
      .withColumn("__pos", col("pos") + 1).drop("pos")

  def jaccardPairs(
      df: DataFrame,
      idCol: String,
      setCol: String,
      t100: Int): DataFrame = {
    require(t100 >= 1 && t100 <= 100, s"t100 must be in [1,100]: $t100")
    val sorted = canonicalSets(df, idCol, setCol)
    val pref = prefixProbes(sorted, t100)
    // Positional filter (PPJoin proper): reduce each pair to its FIRST
    // shared prefix element (min position on both sides — the same
    // element achieves both minima, because common elements appear in
    // the same relative order under a shared global order). At that
    // element no earlier overlap exists, so
    //   overlap ≤ 1 + min(na − pa, nb − pb)
    // is a SOUND upper bound, and a pair that cannot reach the minimal
    // overlap α = ⌈t/(1+t)·(na+nb)⌉ is pruned before any array ever
    // ships to it — this is what keeps the verify join candidate-
    // bounded instead of shared-element-bounded.
    val cands = pref.as("pa").join(pref.as("pb"),
        col("pa.__e") === col("pb.__e") &&
          col("pa.__id") < col("pb.__id") &&
          col("pa.__n") * 100 >= lit(t100.toLong) * col("pb.__n") &&
          col("pb.__n") * 100 >= lit(t100.toLong) * col("pa.__n"))
      .groupBy(col("pa.__id").as("__a"), col("pb.__id").as("__b"))
      .agg(min(col("pa.__pos")).as("__posa"), min(col("pb.__pos")).as("__posb"),
        min(col("pa.__n")).as("__pna"), min(col("pb.__n")).as("__pnb"))
      .where((lit(1L) +
          least(col("__pna") - col("__posa"), col("__pnb") - col("__posb")))
          * (100L + t100) >= lit(t100.toLong) * (col("__pna") + col("__pnb")))
      .select(col("__a"), col("__b"))
    val setsA = sorted.select(col("__id").as("__a"),
      col("__elems").as("__ea"), col("__n").as("__na"))
    val setsB = sorted.select(col("__id").as("__b"),
      col("__elems").as("__eb"), col("__n").as("__nb"))
    cands.join(setsA, "__a").join(setsB, "__b")
      .withColumn("inter",
        size(array_intersect(col("__ea"), col("__eb"))).cast("long"))
      .withColumn("uni", col("__na") + col("__nb") - col("inter"))
      .where(col("inter") * 100 >= lit(t100.toLong) * col("uni"))
      .select(col("__a").as("a"), col("__b").as("b"), col("inter"),
        col("uni"))
  }

  /** Directional containment join: all ordered pairs (a, b), a ≠ b,
    * with |A∩B| ≥ t·|A| — "document a is (nearly) contained in b", the
    * quote/extension dedup relation Jaccard misses (a 100-word quote
    * inside a 10k-word page has tiny Jaccard but full containment).
    * Same prefix-filter machinery, asymmetric: only the CONTAINED side
    * needs a prefix (an A with |A∩B| ≥ t|A| must place a shared
    * element within its first |A|−⌈t|A|⌉+1), while B indexes every
    * element; the positional filter keeps pairs only when A's suffix
    * after the first shared element can still reach ⌈t·|A|⌉. Output:
    * (a, b, inter, n_a, n_b). Empty A matches nothing. */
  def containmentPairs(
      df: DataFrame,
      idCol: String,
      setCol: String,
      t100: Int): DataFrame = {
    require(t100 >= 1 && t100 <= 100, s"t100 must be in [1,100]: $t100")
    val sorted = canonicalSets(df, idCol, setCol)
    val pref = prefixProbes(sorted, t100)
    val allElems = sorted
      .select(col("__id").as("__bid"), col("__n").as("__bn"),
        posexplode(col("__elems")))
      .withColumnRenamed("col", "__e")
      .withColumn("__bpos", col("pos") + 1).drop("pos")
    // Length filter in the join itself (|A∩B| ≥ t|A| forces |B| ≥ t|A|),
    // then the two-sided positional filter at the pair's FIRST shared
    // element: overlap ≤ 1 + min(|A|−pa, |B|−pb) there (no earlier
    // shared element exists, by minimality under the common order), so
    // pairs whose suffixes cannot reach ⌈t·|A|⌉ never reach the verify.
    val cand = pref.as("pa").join(allElems.as("pb"),
        col("pa.__e") === col("pb.__e") &&
          col("pa.__id") =!= col("pb.__bid") &&
          col("pb.__bn") * 100 >= lit(t100.toLong) * col("pa.__n"))
      .groupBy(col("pa.__id").as("__a"), col("pb.__bid").as("__b"))
      .agg(min(col("pa.__pos")).as("__posa"), min(col("pa.__n")).as("__pna"),
        min(col("pb.__bpos")).as("__posb"), min(col("pb.__bn")).as("__pnb"))
      .where((lit(1L) + least(col("__pna") - col("__posa"),
          col("__pnb") - col("__posb"))) * 100L >=
        lit(t100.toLong) * col("__pna"))
      .select(col("__a"), col("__b"))
    val setsA = sorted.select(col("__id").as("__a"),
      col("__elems").as("__ea"), col("__n").as("__na"))
    val setsB = sorted.select(col("__id").as("__b"),
      col("__elems").as("__eb"), col("__n").as("__nb"))
    cand.join(setsA, "__a").join(setsB, "__b")
      .withColumn("inter",
        size(array_intersect(col("__ea"), col("__eb"))).cast("long"))
      .where(col("inter") * 100 >= lit(t100.toLong) * col("__na"))
      .select(col("__a").as("a"), col("__b").as("b"), col("inter"),
        col("__na").as("n_a"), col("__nb").as("n_b"))
  }
}
