package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-anonymity gate over quasi-identifier columns (Sweeney 2002) — the
  * release check a training-data pipeline runs before publishing
  * metadata-bearing corpora: any combination of quasi-identifiers
  * (language × length bucket × source × …) shared by fewer than k
  * records re-identifies its members and must be suppressed or
  * generalized. This operator flags; the caller decides (drop,
  * generalize a bucket, widen the grid) — flagging is the exact,
  * auditable part.
  *
  * Scale shape: one partial-aggregated group-by producing the
  * QI-combination table (bounded by the product of bucket grids, far
  * below the corpus) joined back broadcast — the corpus itself never
  * shuffles. If the QI grid is too fine to broadcast, that is itself a
  * finding (a grid with near-corpus cardinality means nearly every
  * combination is unique — the release fails k-anonymity wholesale).
  */
object Privacy {

  /** Attach (qi_count, is_suppressed): the size of each row's
    * quasi-identifier equivalence class and whether it is below `k`.
    * Null QI values form their own class (null-safe equality), matching
    * group-by semantics. */
  def kAnonymity(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame = {
    require(qiCols.nonEmpty, "at least one quasi-identifier column")
    require(k >= 1, s"k must be >= 1: $k")
    // counts derives from df — rename its key columns so the join is
    // never flagged as an ambiguous self-join.
    val counts = df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("qi_count"))
      .select(qiCols.map(c => col(c).as(s"__qi_$c")) :+ col("qi_count"): _*)
    val cond = qiCols.map(c => col(c) <=> col(s"__qi_$c")).reduce(_ && _)
    df.join(broadcast(counts), cond)
      .drop(qiCols.map(c => s"__qi_$c"): _*)
      .withColumn("is_suppressed", col("qi_count") < k)
  }
}
