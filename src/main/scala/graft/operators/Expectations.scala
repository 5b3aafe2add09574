package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the dbt-test/Deequ idea as
  * one operator: evaluate a battery of row-level predicates and
  * referential checks in as few passes as the checks allow, and emit
  * one small (check, n_rows, n_violations) report a pipeline gate can
  * act on. At 100 TB the design constraint is pass-count: every
  * row-level predicate rides ONE shared scan (each check is a
  * conditional count in a single zero-group aggregate — map-side
  * partials, no shuffle of data rows), and each referential check is
  * one LEFT ANTI join against the referenced key set (broadcast when
  * the key side is small, shuffled otherwise — Catalyst's call).
  */
object Expectations {

  /** One row-level expectation: `holds` should be true for every row.
    * Null predicate results count as VIOLATIONS (an expectation that
    * cannot be evaluated is not satisfied — the tri-state trap made
    * explicit). */
  final case class Check(name: String, holds: Column)

  /** One check's violation count — the tri-state rule (null predicate
    * = violation) exists HERE once; rowChecks and observed both
    * aggregate this expression, so the one-shot report and the
    * in-flight metrics can never disagree on what a violation is. */
  private def violationCount(c: Check) =
    count(when(!coalesce(c.holds, lit(false)), 1))

  private def validate(checks: Seq[Check]): Unit = {
    require(checks.nonEmpty, "at least one check")
    require(checks.map(_.name).distinct.size == checks.size,
      s"duplicate check names: ${checks.map(_.name)}")
  }

  /** Evaluate row-level `checks` over `df` in one scan. Output:
    * (check, n_rows, n_violations), one row per check, in the given
    * order. */
  def rowChecks(df: DataFrame, checks: Seq[Check]): DataFrame = {
    validate(checks)
    val aggs = count(lit(1)).as("__n") +:
      checks.zipWithIndex.map { case (c, i) =>
        violationCount(c).as(s"__v$i")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val report = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("check"), col("__n").as("n_rows"),
        col(s"__v$i").as("n_violations"))
    }
    one.select(explode(array(report: _*)).as("r")).select(col("r.*"))
  }

  /** The metrics side of [[observed]]: `get` blocks (bounded) for the
    * next action's observed metrics and returns them as a name→value
    * map. Implemented with a plain QueryExecutionListener on a
    * STRING-named `observe` — deliberately NOT
    * [[org.apache.spark.sql.Observation]]: registering an Observation
    * initializes the session's ObservationManager, a non-serializable
    * field that then poisons EVERY later closure capturing the session
    * transitively — including any fitted MLlib model whose training
    * summary holds the session (`model.transform` captures the model;
    * "Task not serializable: ObservationManager" three stages later).
    * Found the hard way: one Observation in a spec made unrelated
    * pipeline tests fail. */
  final class ObservedHandle private[Expectations] (
      name: String, spark: org.apache.spark.sql.SparkSession) {
    @volatile private var row: Option[org.apache.spark.sql.Row] = None
    private val closed = new java.util.concurrent.atomic.AtomicBoolean
    private val listener =
      new org.apache.spark.sql.util.QueryExecutionListener {
        // first-delivered action wins (matching Observation's
        // first-result contract); later actions on the same frame
        // must not overwrite what a caller may already be reading
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit =
          qe.observedMetrics.get(name).foreach { r =>
            if (row.isEmpty) row = Some(r)
          }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      }
    spark.listenerManager.register(listener)

    /** Unregister the session-global listener. Idempotent. Callers
      * whose action may THROW before `get` runs must close() in a
      * finally — a leaked listener is invoked on every later query in
      * the session for its whole lifetime. */
    def close(): Unit =
      if (closed.compareAndSet(false, true))
        spark.listenerManager.unregister(listener)

    /** Metrics of the first action that ran the instrumented frame.
      * The listener bus is asynchronous — waits up to `timeoutMs`.
      * Closes the handle (unregisters the listener) on every path. */
    def get(timeoutMs: Long = 30000): Map[String, Any] = {
      try {
        val deadline = System.nanoTime() + timeoutMs * 1000000L
        while (row.isEmpty && System.nanoTime() < deadline)
          Thread.sleep(10)
        val r = row.getOrElse(throw new IllegalStateException(
          "no observed metrics arrived — did an action run on the " +
            "instrumented frame?"))
        r.schema.fieldNames.zip(r.toSeq).toMap
      } finally close()
    }
  }

  /** In-flight expectations — [[rowChecks]]'s metrics piggybacked on
    * the MAIN query via `Dataset.observe`: the pipeline's own action
    * (its write, its count) evaluates the checks as accumulator-style
    * observed metrics, so monitoring costs ZERO extra passes — at
    * 100 TB a separate rowChecks scan is a second read of the corpus;
    * this is the same aggregates attached to the read you were doing
    * anyway. Returns the instrumented frame (pass it onward in place
    * of `df`) and an [[ObservedHandle]] — after any action on the
    * returned frame, `handle.get()` yields `n_rows` plus one
    * `viol_<name>` count per check. The numbers describe exactly the
    * rows THAT ACTION processed (post-pushdown), which is the honest
    * monitoring contract.
    */
  def observed(df: DataFrame, checks: Seq[Check])
      : (DataFrame, ObservedHandle) = {
    validate(checks)
    val name = "graft_obs_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val aggs = count(lit(1)).as("n_rows") +:
      checks.map(c => violationCount(c).as(s"viol_${c.name}"))
    val handle = new ObservedHandle(name, df.sparkSession)
    (df.observe(name, aggs.head, aggs.tail: _*), handle)
  }

  /** Referential expectation: every non-null `fkCol` of `df` must
    * exist as `pkCol` in `ref`. Output: one (check, n_rows,
    * n_violations) row, where n_rows counts the non-null FK rows.
    * Violations are the anti-join survivors — exact, never sampled. */
  def refCheck(
      name: String,
      df: DataFrame,
      fkCol: String,
      ref: DataFrame,
      pkCol: String): DataFrame = {
    // one LEFT join carries both counts (total and pk-miss), so each
    // side scans exactly once — an anti-join PLUS a count would scan
    // the fact side twice. The PK side is renamed: FK and PK columns
    // routinely share a name, which would make the join ambiguous.
    require(fkCol != "__ref_pk", "fk column clashes with check internals")
    val fks = df.where(col(fkCol).isNotNull).select(col(fkCol))
    fks.join(ref.select(col(pkCol).as("__ref_pk")).distinct(),
        col(fkCol) === col("__ref_pk"), "left")
      .agg(count(lit(1)).as("n_rows"),
        count(when(col("__ref_pk").isNull, 1)).as("n_violations"))
      .select(lit(name).as("check"), col("n_rows"), col("n_violations"))
  }
}
