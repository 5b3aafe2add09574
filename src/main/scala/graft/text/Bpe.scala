package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The BPE-training inner loop as a relational operator: corpus-wide
  * adjacent symbol-pair frequencies, the quantity byte-pair-encoding
  * maximizes at every merge step (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units").
  *
  * The scale trick is pre-aggregation: pair explosion runs over the
  * DISTINCT token vocabulary weighted by token frequency, never over
  * the corpus — a 100 TB corpus repeats "the" billions of times, but
  * the vocabulary is millions of rows, so the explode (length-1 pairs
  * per distinct token) is vocabulary-sized and the corpus contributes
  * only a wordcount (one grouped count with map-side partials).
  */
object Bpe {

  /** Corpus-wide adjacent character-pair counts: (pair, cnt) where cnt
    * sums the containing tokens' corpus frequencies (a pair occurring
    * twice inside one token counts twice per occurrence of that
    * token). Single-character tokens contribute nothing — and are
    * filtered BEFORE the position explode: Spark's `sequence(1, 0)`
    * DESCENDS instead of being empty, so an unguarded explode would
    * fabricate positions for them. */
  def pairCounts(df: DataFrame, textCol: String): DataFrame = {
    val tf = df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("freq"))
    tf.where(length(col("token")) >= 2)
      .select(col("token"), col("freq"),
        explode(expr("sequence(1, length(token) - 1)")).as("p"))
      .select(expr("substring(token, p, 2)").as("pair"), col("freq"))
      .groupBy(col("pair")).agg(sum(col("freq")).as("cnt"))
  }

  /** Top merge candidates: the k most frequent pairs, count-desc with
    * the deterministic pair tie-break — row 1 is the merge BPE would
    * perform next. TakeOrderedAndProject: k rows of driver memory. */
  def mergeCandidates(df: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"mergeCandidates needs k >= 1, got $k")
    pairCounts(df, textCol)
      .orderBy(col("cnt").desc, col("pair"))
      .limit(k)
  }
}
