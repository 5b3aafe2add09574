package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance similarity join — record linkage's fuzzy-match
  * kernel: all pairs within Levenshtein distance `maxDist`, without
  * the all-pairs cross product. Two strings within distance d differ
  * in length by at most d, so bucketing by length band
  * (width d+1) and probing only adjacent bands is a LOSSLESS blocking:
  * every qualifying pair shares or neighbors a band. One side explodes
  * to its three candidate bands, the other stays put, and the join is
  * a plain shuffled equi-join on the band id with the exact
  * `levenshtein` (codegen'd built-in) as residual filter — the
  * RangeJoin discipline applied to string similarity.
  *
  * Each unordered pair emerges exactly once: the probe side covers the
  * partner's unique home band, and `id_a < id_b` keeps one direction.
  *
  * Scale honesty: length blocking alone leaves same-band quadratic
  * work, which is fine when bands are balanced (trimmed prefixes,
  * titles, codes) and wrong for a corpus where one length dominates —
  * compose with a content prefilter (n-gram LSH from [[graft.dedup
  * .Dedup]]) before the residual in that regime.
  */
object FuzzyJoin {

  /** All (id_a, id_b, dist) with `dist = levenshtein ≤ maxDist`,
    * `id_a < id_b`, over non-null strings of `strCol`. Band width is
    * `maxDist + 1`; `maxDist = 0` degrades to an exact-match
    * self-join (still banded, never cross).
    */
  def editDistancePairs(
      df: DataFrame,
      idCol: String,
      strCol: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0: $maxDist")
    val w = maxDist + 1
    val base = df
      .where(col(strCol).isNotNull)
      .select(col(idCol).as("__id"), col(strCol).as("__s"),
        graft.operators.RangeJoin.floorDiv(
          length(col(strCol)).cast("long"), w.toLong).as("__band"))
    val probe = base.select(col("__id").as("id_a"), col("__s").as("s_a"),
      explode(array((-1 to 1).map(o => col("__band") + lit(o)): _*))
        .as("__band"))
    val home = base.select(col("__id").as("id_b"), col("__s").as("s_b"),
      col("__band"))
    probe.join(home, Seq("__band"))
      .where(col("id_a") < col("id_b"))
      .where(abs(length(col("s_a")) - length(col("s_b"))) <= maxDist)
      .where(levenshtein(col("s_a"), col("s_b")) <= maxDist)
      .select(col("id_a"), col("id_b"),
        levenshtein(col("s_a"), col("s_b")).as("dist"))
  }
}
