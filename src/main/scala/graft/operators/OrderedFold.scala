package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.ColumnBridge
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
  * The fold runs directly on the plan's InternalRow output
  * (`queryExecution.toRdd`) and group keys are compared as projected
  * UnsafeRow bytes — no per-row deserialization to external Rows, which
  * the previous `.rdd`-based formulation paid for every row of every fold
  * query. Callbacks therefore read columns positionally
  * (`row.getInt(i)`); the rows handed to `init`/`step` are only valid for
  * the duration of the call (copy if retained).
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
    * @param step    fold one row into the state (row valid only during
    *                the call)
    * @param emit    called once per group at group end: (group key row —
    *                keyCols positionally — , final state) => output rows
    *                matching `outSchema` (e.g. GenericInternalRow;
    *                strings as UTF8String)
    * @param outSchema schema of emitted rows
    */
  def foldGroups[S](
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[Column],
      outSchema: StructType)(
      init: InternalRow => S,
      step: (S, InternalRow) => S,
      emit: (InternalRow, S) => Iterator[InternalRow]): DataFrame = {
    val spark = df.sparkSession
    val parted = df
      .repartition(keyCols.map(col): _*)
      .sortWithinPartitions(keyCols.map(col) ++ orderCols: _*)
    val schema = df.schema
    val keyExprs = keyCols.map { c =>
      val i = schema.fieldIndex(c)
      BoundReference(i, schema(i).dataType, schema(i).nullable)
    }

    val rdd = parted.queryExecution.toRdd.mapPartitions { it =>
      val keyProj = UnsafeProjection.create(keyExprs)
      new Iterator[InternalRow] {
        private var out: Iterator[InternalRow] = Iterator.empty
        private var curKey: UnsafeRow = null
        private var state: S = _
        private def advance(): Unit = {
          while (!out.hasNext && it.hasNext) {
            val r = it.next()
            val k = keyProj(r)
            if (curKey == null) { curKey = k.copy(); state = init(r) }
            else if (k != curKey) {
              out = emit(curKey, state)
              curKey = k.copy(); state = init(r)
            }
            state = step(state, r)
          }
          if (!out.hasNext && !it.hasNext && curKey != null) {
            out = emit(curKey, state)
            curKey = null
          }
        }
        override def hasNext: Boolean = { advance(); out.hasNext }
        override def next(): InternalRow = { advance(); out.next() }
      }
    }
    ColumnBridge.ofInternalRows(spark, rdd, outSchema)
  }

  /** Streaming per-row grouped scan — foldGroups' sibling for recurrences
    * where every input row produces one output row (running state, greedy
    * assignment, cumulative processes with resets). The batch analog of
    * `flatMapGroupsWithState`, but over Tungsten rows with the same
    * secondary-sort shape as foldGroups: one shuffle on the group key,
    * partition-level external sort, then a single streaming pass whose
    * only heap residue is the CURRENT group's state — output rows are
    * emitted as input rows stream through, so memory is constant even when
    * one group is the whole corpus (unlike emit-at-group-end folds whose
    * state must then hold the group's output).
    *
    * @param init  fresh state at each group boundary
    * @param step  (state, row) => (next state, output row matching
    *              `outSchema`); the input row is only valid during the call
    */
  def scanGroups[S](
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[Column],
      outSchema: StructType)(
      init: () => S,
      step: (S, InternalRow) => (S, InternalRow)): DataFrame = {
    val spark = df.sparkSession
    val parted = df
      .repartition(keyCols.map(col): _*)
      .sortWithinPartitions(keyCols.map(col) ++ orderCols: _*)
    val schema = df.schema
    val keyExprs = keyCols.map { c =>
      val i = schema.fieldIndex(c)
      BoundReference(i, schema(i).dataType, schema(i).nullable)
    }
    val rdd = parted.queryExecution.toRdd.mapPartitions { it =>
      val keyProj = UnsafeProjection.create(keyExprs)
      var curKey: UnsafeRow = null
      var state: S = null.asInstanceOf[S]
      it.map { r =>
        val k = keyProj(r)
        if (curKey == null || k != curKey) { curKey = k.copy(); state = init() }
        val (s2, out) = step(state, r)
        state = s2
        out
      }
    }
    ColumnBridge.ofInternalRows(spark, rdd, outSchema)
  }
}
