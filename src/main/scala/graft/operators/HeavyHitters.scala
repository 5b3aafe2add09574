package graft.operators
import graft.Materialize.MatOps

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Exact frequent items ("heavy hitters") in two scans and bounded
  * memory — Misra–Gries candidate generation fused with an exact
  * verification pass. The naive `groupBy(item).count.filter` shuffles
  * the ENTIRE item universe (a token vocabulary, a URL space) to
  * answer a question whose output is tiny; this operator shuffles only
  * candidate rows.
  *
  * Scan 1: each partition runs Misra–Gries with `k` counters
  * (`mapPartitions` — genuine per-partition imperative state). MG's
  * guarantee, summed across partitions: an item NOT surviving in any
  * partition has global count ≤ Σᵢ nᵢ/(k+1) = n/(k+1). So for a
  * threshold above n/(k+1), the union of per-partition survivors
  * (≤ k × partitions items — broadcastable) contains every qualifying
  * item. Scan 2: count ONLY candidate-flagged rows exactly (one
  * aggregate whose map-side partials collapse non-candidates into a
  * single null group — the full-vocabulary shuffle never happens) and
  * read the total n off the same aggregate.
  *
  * The threshold is the integer fraction `num/den` of n, compared by
  * cross-multiplication (`cnt·den ≥ n·num` — exact in longs up to
  * ~9e18·den), so results are scale-free and engine-portable. The
  * construction requires `(k+1)·num > den` — below that MG cannot
  * promise completeness, and the call refuses rather than silently
  * under-reporting.
  */
object HeavyHitters {

  private[graft] def misraGries(it: Iterator[String], k: Int):
      Iterator[String] = {
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    it.foreach { x =>
      if (x != null) {
        if (m.contains(x)) m(x) += 1L
        else if (m.size < k) m(x) = 1L
        else {
          // decrement-all: the O(k) amortized MG step
          m.mapValuesInPlace((_, v) => v - 1L)
          m.filterInPlace((_, v) => v > 0L)
        }
      }
    }
    m.keysIterator
  }

  /** Items of `itemCol` (cast to string; nulls excluded) whose exact
    * count is ≥ `num/den` of the total item count. Output:
    * (item, cnt), exact. `k` sizes the per-partition MG state;
    * `(k+1)·num > den` is required for completeness.
    */
  def frequentItems(
      df: DataFrame,
      itemCol: String,
      num: Long,
      den: Long,
      k: Int = 4095): DataFrame = {
    require(num > 0 && den > 0, s"threshold fraction must be positive: $num/$den")
    require(k >= 1, s"k must be >= 1: $k")
    require((k + 1L) * num > den,
      s"MG completeness needs (k+1)*num > den: k=$k, $num/$den")
    val items = df.select(col(itemCol).cast("string").as("item"))
      .where(col("item").isNotNull)
    val cand = items.as(Encoders.STRING).mapPartitions(misraGries(_, k))(
      Encoders.STRING).distinct().toDF("__cand")
    val counts = items
      .join(broadcast(cand), col("item") === col("__cand"), "left_outer")
      // non-candidates collapse into the null group in the map-side
      // partial; only candidates + one sentinel group cross the wire
      .groupBy(when(col("__cand").isNotNull, col("item")).as("item"))
      .agg(count(lit(1)).as("cnt"))
      // candidate-sized: materialize once so the threshold read and the
      // output filter share one scan-2 execution (stage-boundary rule)
      .materialize()
    val total = counts.agg(sum(col("cnt")).as("__n"))
    counts.where(col("item").isNotNull)
      .crossJoin(broadcast(total))
      .where(col("cnt") * lit(den) >= col("__n") * lit(num))
      .select(col("item"), col("cnt"))
  }
}
