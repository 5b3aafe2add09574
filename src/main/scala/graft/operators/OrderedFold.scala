package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Order-sensitive per-group fold, the one operator class the reference
  * implements outside relational algebra (the season-reset ELO fold,
  * reference `src/features/elo.py:93-121`, a grouped Pandas UDF that sorts
  * each season by DayNum and folds ratings game-by-game).
  *
  * Re-expressed for scale as a **secondary sort**: repartition by the group
  * key, sort *within* partitions by (key, order), then stream each partition
  * once with a constant-memory fold. Unlike `groupByKey(...).flatMapGroups`
  * (which gives no intra-group ordering guarantee without buffering the
  * whole group), this never materializes a group: at 100 TB a single group
  * (e.g. one season of games) can exceed executor memory, but here only the
  * fold STATE lives on the heap while rows stream through. One shuffle, no
  * sort-spill surprises (Spark's external sorter handles partition-level
  * sort spilling).
  *
  * Scale limit, stated honestly: the parallelism unit is the GROUP — a
  * single group's fold is inherently sequential (each step reads the
  * previous state), so wall-clock is bounded by the largest group's row
  * count on one core. That is intrinsic to order-dependent recurrences
  * (the reference has the same bound, per season). When the recurrence is
  * associative or has a closed form (EWMA, hash chains, running sums),
  * prefer the algebraic formulation (window functions / scans) which
  * parallelizes within groups; OrderedFold is for the genuinely
  * non-associative remainder (e.g. ELO's coupled per-team map state).
  */
object OrderedFold {

  /** Fold `df` grouped by `keyCols` in ascending `orderCols` order.
    *
    * @param init    state for a fresh group, given its first row
    * @param step    fold one row into the state
    * @param emit    called once per group at group end: (last row of group,
    *                final state) => output rows
    * @param outSchema schema of emitted rows
    */
  def foldGroups[S](
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[Column],
      outSchema: StructType)(
      init: Row => S,
      step: (S, Row) => S,
      emit: (Row, S) => Iterator[Row]): DataFrame = {
    val spark = df.sparkSession
    val parted = df
      .repartition(keyCols.map(col): _*)
      .sortWithinPartitions(keyCols.map(col) ++ orderCols: _*)
    val keyIdx = keyCols.map(df.schema.fieldIndex)

    val rdd = parted.rdd.mapPartitions { it =>
      new Iterator[Row] {
        private var out: Iterator[Row] = Iterator.empty
        private var curKey: Seq[Any] = null
        private var curRow: Row = null
        private var state: S = _
        private def keyOf(r: Row): Seq[Any] = keyIdx.map(r.get)
        private def advance(): Unit = {
          while (!out.hasNext && it.hasNext) {
            val r = it.next()
            val k = keyOf(r)
            if (curKey == null) { curKey = k; state = init(r) }
            else if (k != curKey) {
              out = emit(curRow, state)
              curKey = k; state = init(r)
            }
            state = step(state, r)
            curRow = r
          }
          if (!out.hasNext && !it.hasNext && curKey != null) {
            out = emit(curRow, state)
            curKey = null; curRow = null
          }
        }
        override def hasNext: Boolean = { advance(); out.hasNext }
        override def next(): Row = { advance(); out.next() }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
