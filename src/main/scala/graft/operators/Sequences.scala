package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequential-pattern counting over an event log — the "what paths do
  * entities actually take?" profile (funnel discovery, error-path
  * mining, session-shape features for training data).
  *
  * Counts contiguous k-grams of event types per entity: each entity's
  * log is sorted once by (ts, id) and the k−1 successors are read with
  * `lead` over ONE shared window — a single exchange keyed on the
  * entity, no self-joins, no explode (the k-gram row count equals the
  * event count, not events×k). The aggregate then reduces to the
  * pattern vocabulary (≤ |event types|^k), so the second exchange is
  * dim-sized. This is the PrefixSpan-style support count restricted to
  * contiguous patterns — the restriction that keeps the operator one
  * window pass instead of an iterative projection growth.
  *
  * Only complete windows count: an entity with fewer than k events
  * contributes nothing; the last k−1 positions of each log likewise.
  * A NULL event type occupies its position but forms no pattern —
  * every window containing it is dropped (all k slots are
  * null-checked; checking only the leads would mislabel a
  * null-leading window as a (k−1)-gram). Ordering ties break by
  * `idCol`, so the pattern multiset is deterministic and cross-engine
  * replayable.
  */
object Sequences {

  /** Per-pattern occurrence and entity-support counts.
    *
    * @return (kgram, n_occurrences, n_entities) where kgram is the
    *         space-joined type sequence
    */
  def kgramCounts(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      idCol: String,
      typeCol: String,
      k: Int): DataFrame = {
    require(k >= 2 && k <= 8, s"k must be in [2, 8], got $k")
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    val steps = (1 until k).map(i =>
      lead(col(typeCol), i).over(w).as(s"__s$i"))
    val slots = col(typeCol).as("__s0") +: steps
    events
      .select(col(entityCol) +: slots: _*)
      .where((0 until k).map(i => col(s"__s$i").isNotNull).reduce(_ && _))
      .withColumn("kgram",
        concat_ws(" ", (0 until k).map(i => col(s"__s$i")): _*))
      .groupBy(col("kgram"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col(entityCol)).as("n_entities"))
  }
}
