package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Corpus snapshot diff — the data-versioning primitive behind
  * incremental pipeline runs: given two snapshots of a document table,
  * classify every id as added / removed / changed / unchanged by
  * comparing content fingerprints. This is what decides how much of a
  * 100 TB corpus a nightly re-run actually has to touch (re-embed,
  * re-dedup, re-shard): everything but `unchanged`.
  *
  * Scale shape: the ~62-bit [[graft.dedup.Dedup.contentFingerprint]] is
  * computed in each snapshot's scan stage and ONLY (id, fp) pairs reach
  * the full-outer join — document payloads never shuffle, so the
  * exchange is O(ids), not O(corpus bytes). The join is a plain equi
  * full-outer on the id (sort-merge at scale, no broadcast needed on
  * either side since both snapshots are corpus-sized).
  */
object Versioning {

  /** Diff `newDf` against `oldDf` by `idCol`, comparing
    * `contentFingerprint(trim(textCol))`. Output: (idCol, status) with
    * status in {'added', 'removed', 'changed', 'unchanged'}. Callers
    * that only re-process deltas filter `status != 'unchanged'`. Null
    * text fingerprints as empty text (fp is never null), so "id absent
    * from a snapshot" is signaled only by the join side — a null fp
    * could not distinguish a missing row from a null document.
    */
  def snapshotDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    def fps(df: DataFrame, fpName: String) =
      df.select(col(idCol),
        Dedup.contentFingerprint(trim(coalesce(col(textCol), lit(""))))
          .as(fpName))
    val o = fps(oldDf, "old_fp")
    val n = fps(newDf, "new_fp")
    o.join(n, Seq(idCol), "full_outer")
      .select(
        col(idCol),
        when(col("old_fp").isNull, lit("added"))
          .when(col("new_fp").isNull, lit("removed"))
          .when(col("old_fp") =!= col("new_fp"), lit("changed"))
          .otherwise(lit("unchanged"))
          .as("status"))
  }
}
