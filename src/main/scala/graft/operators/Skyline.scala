package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto front (skyline): the rows not dominated under
  * (maximize `xCol`, maximize `yCol`) — dominated meaning some other
  * row is ≥ in both coordinates and > in at least one. Minimization
  * axes negate on the way in. The multi-objective data-selection
  * primitive ("most tokens for fewest chars", "best quality per byte")
  * that a WHERE clause cannot express.
  *
  * Formulation: reduce to ONE row per distinct x (`max(y)` — a keyed
  * aggregate with map-side partials, the only full-data exchange),
  * then a prefix max over that reduced set in x-descending order
  * decides each x's fate: x is on the front iff its ymax exceeds the
  * max ymax of all STRICTLY greater x. A rows-based frame on the
  * DISTINCT-x table is exactly "strictly greater x" — no range-frame
  * integer-spacing assumption, so fractional axes are handled
  * correctly. Front rows come back by joining the (small) front-x set
  * onto the input and keeping rows at their x's ymax — duplicates of
  * a frontier point all survive, matching NOT EXISTS semantics.
  *
  * Scale shape: one exchange for the per-x aggregate; the window
  * passes run over |distinct x| rows (a per-partition prefix prune
  * shrinks them before the single-partition global pass); the
  * join-back broadcasts the front-x set, so the input is never
  * re-shuffled. Worst case (all x distinct, perfectly anti-correlated
  * axes) the front IS the input and no skyline algorithm avoids
  * materializing it.
  */
object Skyline {

  /** Front-deciding prune over the per-x table: keep x iff ymax
    * beats the prefix max over the given partitioning's preceding
    * rows in x-desc order. */
  private def prune(perX: DataFrame, part: Seq[String]): DataFrame = {
    val w = Window.partitionBy(part.map(col): _*)
      .orderBy(col("__x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    perX.withColumn("__pm", max(col("__ymax")).over(w))
      .where(col("__pm").isNull || col("__ymax") > col("__pm"))
      .drop("__pm")
  }

  /** The Pareto front of `df` under (max `xCol`, max `yCol`); all other
    * columns ride along. Rows where either coordinate is null are
    * dropped (null is ordered under everything a window max sees —
    * domination against it is ill-defined, and a skyline of unknowns
    * answers nothing).
    */
  def paretoFront(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val clash = df.columns.filter(_.startsWith("__"))
    require(clash.isEmpty, s"columns clash with skyline internals: ${clash.toSeq}")
    val nonNull = df.where(col(xCol).isNotNull && col(yCol).isNotNull)
    val perX = nonNull.groupBy(col(xCol).as("__x"))
      .agg(max(col(yCol)).as("__ymax"))
    // per-partition prefix prune first (the window sees rows already
    // reduced to distinct x), then the global pass over survivors only
    val local = prune(perX.withColumn("__pid", spark_partition_id()),
      Seq("__pid")).drop("__pid")
    val frontX = prune(local, Seq.empty)
    nonNull.join(broadcast(frontX),
        col(xCol) === col("__x") && col(yCol) === col("__ymax"), "left_semi")
  }
}
