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
  * Scale shape: skylines are distributive — a row dominated within any
  * subset is dominated globally — so the front computes in two prunes:
  * a per-partition front (windows keyed by `spark_partition_id()`, no
  * data movement), then the global front over the per-partition
  * survivors. Only survivors cross the wire; for correlated data the
  * local front is tiny. The global pass is a single-partition window —
  * safe BECAUSE it runs on pre-pruned rows, but worst-case (perfectly
  * anti-correlated axes) the front is the whole input and no skyline
  * algorithm avoids materializing it.
  *
  * Within one pass, domination reads off two range-framed window
  * maxima in (x desc) order: `max(y)` over strictly-greater x (≥ y ⇒
  * dominated), and `max(y)` over equal x (> y ⇒ dominated). Duplicate
  * (x, y) points dominate nothing and are all kept — the NOT EXISTS
  * oracle semantics exactly.
  */
object Skyline {

  private def front(df: DataFrame, part: Seq[String],
      xCol: String, yCol: String): DataFrame = {
    val base = Window.partitionBy(part.map(col): _*).orderBy(col(xCol).desc)
    // range frames under desc order: "preceding" is larger x, so
    // (unboundedPreceding, -1) spans x' > x and (0, 0) spans x' = x
    val strict = base.rangeBetween(Window.unboundedPreceding, -1)
    val ties = base.rangeBetween(Window.currentRow, Window.currentRow)
    df.withColumn("__dom", coalesce(
        max(col(yCol)).over(strict) >= col(yCol), lit(false)) ||
        max(col(yCol)).over(ties) > col(yCol))
      .where(!col("__dom"))
      .drop("__dom")
  }

  /** The Pareto front of `df` under (max `xCol`, max `yCol`); all other
    * columns ride along. Rows where either coordinate is null are
    * dropped (null is ordered under everything a window max sees —
    * domination against it is ill-defined, and a skyline of unknowns
    * answers nothing).
    */
  def paretoFront(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val clash = df.columns.filter(c => c == "__dom" || c == "__pid")
    require(clash.isEmpty, s"columns clash with skyline internals: ${clash.toSeq}")
    val nonNull = df.where(col(xCol).isNotNull && col(yCol).isNotNull)
    val local = front(nonNull.withColumn("__pid", spark_partition_id()),
      Seq("__pid"), xCol, yCol).drop("__pid")
    front(local, Seq.empty, xCol, yCol)
  }
}
