package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType

/** Event-time streaming analytics over the events shape (ts: epoch-nano
  * long, user_id, event_type, value). Every transform here works on BOTH a
  * batch DataFrame and a readStream DataFrame (Structured Streaming's
  * unified model); watermarks only bind in streaming mode.
  */
object EventStreams {

  /** Epoch-nano long → event-time timestamp column (µs precision). */
  def eventTime(ts: String = "ts") =
    timestamp_micros(expr(s"$ts div 1000")).as("event_time")

  /** Tumbling 1-hour windows per event_type with a 2-hour watermark:
    * count + value sum. Streaming: incremental state per (window, type),
    * late data beyond the watermark dropped; at scale state is bounded by
    * (#types × watermark horizon / window).
    */
  def hourlyTypeStats(events: DataFrame): DataFrame =
    events
      .withColumn("event_time", eventTime())
      .withWatermark("event_time", "2 hours")
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      // decimal sum: exact, so results are partition- and
      // micro-batch-order independent (double accumulation is neither)
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(28, 6))).cast("double").as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Sliding 1-hour windows every 15 minutes per event_type: each event
    * lands in exactly 4 overlapping windows (hour/quarter divide evenly).
    * Streaming: one state row per (window, type) inside the watermark
    * horizon, like the tumbling variant but 4× the state rows.
    */
  def slidingTypeStats(events: DataFrame): DataFrame =
    events
      .withColumn("event_time", eventTime())
      .withWatermark("event_time", "2 hours")
      .groupBy(
        window(col("event_time"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(28, 6))).cast("double").as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Built-in session windows (gap-based) — the declarative sibling of
    * [[sessionize]]: Spark merges per-key windows whose events are within
    * `gap` of each other; in streaming mode the watermark closes them.
    */
  def sessionStats(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withColumn("event_time", eventTime())
      .withWatermark("event_time", "2 hours")
      .groupBy(col("user_id"), session_window(col("event_time"), gap))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(28, 6))).cast("double").as("total_value"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total_value"))

  /** Stream-stream interval join: attribute each purchase to the same
    * user's clicks within the trailing `windowExpr` (e.g. "1 hour").
    * Watermarks on both sides bound the join state; works identically on
    * batch frames.
    */
  def attributedPurchases(
      clicks: DataFrame,
      purchases: DataFrame,
      windowExpr: String = "1 hour"): DataFrame = {
    val c = clicks
      .withColumn("click_time", eventTime())
      .withWatermark("click_time", "2 hours")
      .select(
        col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("click_time"))
    val p = purchases
      .withColumn("purchase_time", eventTime())
      .withWatermark("purchase_time", "2 hours")
      .select(
        col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("value").as("amount"), col("purchase_time"))
    p.join(c,
      expr(s"""
        p_user = c_user AND
        click_time <= purchase_time AND
        click_time >= purchase_time - INTERVAL $windowExpr"""))
      .select(
        col("p_user").as("user_id"), col("purchase_id"), col("amount"),
        col("click_id"), col("click_time"), col("purchase_time"))
  }

  case class FunnelEvent(user_id: Long, event_type: String, event_time_us: Long)
  case class FunnelProgress(
      user_id: Long, stage_times_us: Array[Long], stages_completed: Int)

  /** Streaming-native ordered funnel — [[graft.operators.Funnel.funnel]]'s
    * semantics carried incrementally in O(#stages) state per user: the
    * earliest completion time of every stage, where stage k counts only
    * at or after the user's stage-(k−1) time. Each micro-batch emits an
    * updated [[FunnelProgress]] snapshot for users whose funnel moved
    * (update-mode output; `stage_times_us` holds −1 for uncompleted
    * stages, and `stages_completed` is the prefix length — times are
    * set-once, so snapshots are monotone and the latest one per user is
    * the funnel state).
    *
    * Contract: per-user event-TIME-ordered delivery across micro-batches
    * (the file-source tests stage time-sorted files; a production feed
    * would sort within watermark holds). With in-order delivery the
    * final snapshot equals the batch funnel exactly — pinned by
    * MlAndStreamingSpec. Dual-mode: on a batch Dataset the same code
    * runs with one group call per user. At scale, pair with a state TTL
    * (ProcessingTimeTimeout) to evict abandoned funnels; the state per
    * user is a fixed #stages-length array either way.
    */
  def funnelStream(
      events: Dataset[FunnelEvent],
      stages: Seq[String]): Dataset[FunnelProgress] = {
    require(stages.nonEmpty && stages.distinct == stages,
      s"stages must be non-empty and distinct: $stages")
    import events.sparkSession.implicits._
    val stageIdx = stages.zipWithIndex.toMap
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Array[Long], FunnelProgress](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[FunnelEvent], state: GroupState[Array[Long]]) =>
          val times = state.getOption.getOrElse(Array.fill(stages.size)(-1L))
          var changed = false
          // tie-break by STAGE INDEX: the batch funnel's gate is
          // ts >= t_prev (same-timestamp completion counts), so a
          // same-ts (view, click) pair must process view first or the
          // click is dropped forever (times are set-once) and stream
          // would diverge from batch — spec-pinned
          rows.toSeq
            .sortBy(e => (e.event_time_us,
              stageIdx.getOrElse(e.event_type, Int.MaxValue)))
            .foreach { e =>
            stageIdx.get(e.event_type).foreach { k =>
              val prevOk = k == 0 ||
                (times(k - 1) >= 0 && e.event_time_us >= times(k - 1))
              if (times(k) < 0 && prevOk) {
                times(k) = e.event_time_us
                changed = true
              }
            }
          }
          state.update(times)
          if (changed)
            Iterator(FunnelProgress(userId, times.clone(), times.count(_ >= 0)))
          else Iterator.empty
      }
  }

  case class SessionEvent(user_id: Long, event_time_us: Long, value: Double)
  case class SessionState(start: Long, last: Long, n: Int, total: Double)
  case class UserSession(
      user_id: Long, session_start_us: Long, session_end_us: Long,
      n_events: Int, total_value: Double)

  /** Gap-based sessionization with explicit O(1)-per-user state: a
    * session closes after `gapUs` of inactivity.
    *
    * Dual-mode: the open session is CARRIED in GroupState, so in
    * streaming mode sessions correctly span micro-batches and are closed
    * either by a later event past the gap or by the processing-time
    * timeout firing after `gapUs` of silence. In batch mode
    * (`flushAtEnd = true`, timeouts never fire) the trailing session is
    * flushed at iterator end instead.
    */
  def sessionize(
      events: Dataset[SessionEvent],
      gapUs: Long,
      flushAtEnd: Boolean = true): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (flushAtEnd) GroupStateTimeout.NoTimeout()
      else GroupStateTimeout.ProcessingTimeTimeout()
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append(), timeoutConf) {
        (userId: Long, rows: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          val closed = Seq.newBuilder[UserSession]
          if (state.hasTimedOut) {
            state.getOption.foreach(s =>
              closed += UserSession(userId, s.start, s.last, s.n, s.total))
            state.remove()
          } else {
            val sorted = rows.toSeq.sortBy(_.event_time_us)
            var open: Option[SessionState] = state.getOption
            sorted.foreach { e =>
              open match {
                case Some(s) if e.event_time_us - s.last <= gapUs =>
                  open = Some(s.copy(last = e.event_time_us, n = s.n + 1,
                    total = s.total + e.value))
                case Some(s) =>
                  closed += UserSession(userId, s.start, s.last, s.n, s.total)
                  open = Some(SessionState(e.event_time_us, e.event_time_us, 1, e.value))
                case None =>
                  open = Some(SessionState(e.event_time_us, e.event_time_us, 1, e.value))
              }
            }
            if (flushAtEnd) {
              open.foreach(s => closed += UserSession(userId, s.start, s.last, s.n, s.total))
              state.remove()
            } else {
              open.foreach { s =>
                state.update(s)
                state.setTimeoutDuration(gapUs / 1000) // µs → ms of silence
              }
            }
          }
          closed.result().iterator
      }
  }

  case class AttrEvent(
      user_id: Long, event_time_us: Long, event_id: Long, event_type: String)
  case class AttrConversion(
      user_id: Long, event_id: Long, event_time_us: Long,
      attributed_channel: String)
  case class TouchState(ts: Long, id: Long, channel: String)

  /** Streaming last-touch attribution — [[graft.operators.Attribution
    * .lastTouch]]'s streaming face: conversions attribute as they
    * arrive, with the per-user "most recent touch" carried as O(1)
    * GroupState (ts, id, channel) across micro-batches.
    *
    * Within a batch of rows the same (ts, id) sort as the batch
    * window's frame decides eligibility: a touch processes before a
    * conversion iff it sorts strictly before it — so a same-timestamp
    * touch with a larger id does NOT get credit, exactly like the
    * batch frame. Stream ≡ batch holds when micro-batches arrive in
    * event-time order (the file-source contract every face here
    * documents); dual-mode: the same operator over a batch Dataset is
    * the one-batch special case.
    */
  def attributionStream(
      events: Dataset[AttrEvent],
      convType: String,
      touchTypes: Set[String],
      lookbackUs: Long,
      stateTtlMs: Option[Long] = None): Dataset[AttrConversion] = {
    require(!touchTypes.contains(convType),
      "convType in touchTypes would let a conversion credit itself")
    require(stateTtlMs.forall(_ > 0), s"stateTtlMs must be > 0: $stateTtlMs")
    // the semantics-safety condition below is a hard contract, not
    // advice: a processing-time TTL shorter than the event-time
    // lookback expires touches that are still credit-eligible and
    // silently changes attribution on a live stream — refuse it
    require(stateTtlMs.forall(_ * 1000L >= lookbackUs),
      s"stateTtlMs must cover the lookback (>= ${lookbackUs / 1000} ms" +
        s" for lookbackUs=$lookbackUs): $stateTtlMs")
    import events.sparkSession.implicits._
    // Unbounded-user streams should pass stateTtlMs (>= lookbackUs/1000
    // to stay semantics-safe on a live stream): a touch older than the
    // lookback can never be credited again, so expiring its GroupState
    // after that much processing-time silence only drops dead weight —
    // without it, per-user state grows with the distinct-user count
    // forever. Default None keeps the dual-mode batch face timeout-free.
    val timeoutConf = stateTtlMs
      .map(_ => GroupStateTimeout.ProcessingTimeTimeout())
      .getOrElse(GroupStateTimeout.NoTimeout())
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TouchState, AttrConversion](
        OutputMode.Append(), timeoutConf) {
        (userId: Long, rows: Iterator[AttrEvent], state: GroupState[TouchState]) =>
          if (state.hasTimedOut) {
            // silent user: the carried touch is past the lookback
            state.remove()
            Iterator.empty
          } else {
            var touch: Option[TouchState] = state.getOption
            val out = Seq.newBuilder[AttrConversion]
            rows.toSeq.sortBy(e => (e.event_time_us, e.event_id)).foreach { e =>
              if (e.event_type == convType) {
                val credited = touch.filter(t =>
                  e.event_time_us - t.ts <= lookbackUs)
                out += AttrConversion(userId, e.event_id, e.event_time_us,
                  credited.map(_.channel).getOrElse("(none)"))
              } else if (touchTypes.contains(e.event_type)) {
                touch = Some(TouchState(e.event_time_us, e.event_id, e.event_type))
              }
            }
            touch.foreach { t =>
              state.update(t)
              stateTtlMs.foreach(state.setTimeoutDuration)
            }
            out.result().iterator
          }
      }
  }

  case class KgramOccurrence(user_id: Long, last_event_id: Long, kgram: String)

  /** Streaming k-gram emission — [[graft.operators.Sequences
    * .kgramCounts]]'s streaming face: each contiguous k-gram of a
    * user's event types is emitted EXACTLY ONCE, as soon as its last
    * event arrives, with the trailing k−1 events carried as O(k)
    * GroupState so patterns span micro-batches. Aggregating the
    * occurrences downstream (count per kgram) reproduces the batch
    * operator's counts; the per-occurrence form is emitted here
    * because it is the append-mode-friendly shape (each row is final
    * the moment it appears).
    *
    * Within a batch, rows process in (ts, id) order — the batch
    * window's sort — so stream ≡ batch holds under the usual
    * time-ordered-micro-batch file-source contract.
    */
  def kgramStream(
      events: Dataset[AttrEvent],
      k: Int,
      stateTtlMs: Option[Long] = None): Dataset[KgramOccurrence] = {
    require(k >= 2 && k <= 8, s"k must be in [2, 8], got $k")
    require(stateTtlMs.forall(_ > 0), s"stateTtlMs must be > 0: $stateTtlMs")
    import events.sparkSession.implicits._
    // Same unbounded-user guard as attributionStream: with a TTL, a
    // user silent past it drops their O(k) tail — patterns that would
    // have SPANNED the silence gap are lost (documented trade; k-grams
    // across a long dormancy are rarely the signal anyway); without
    // it, state grows with the distinct-user count forever.
    val timeoutConf = stateTtlMs
      .map(_ => GroupStateTimeout.ProcessingTimeTimeout())
      .getOrElse(GroupStateTimeout.NoTimeout())
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Seq[String], KgramOccurrence](
        OutputMode.Append(), timeoutConf) {
        (userId: Long, rows: Iterator[AttrEvent], state: GroupState[Seq[String]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var tail: Seq[String] = state.getOption.getOrElse(Seq.empty)
            val out = Seq.newBuilder[KgramOccurrence]
            rows.toSeq.sortBy(e => (e.event_time_us, e.event_id)).foreach { e =>
              val window = tail :+ e.event_type
              // null types occupy their slot but form no pattern — the
              // batch operator's contract (all k slots null-checked)
              if (window.size == k && window.forall(_ != null))
                out += KgramOccurrence(userId, e.event_id, window.mkString(" "))
              tail = window.takeRight(k - 1)
            }
            state.update(tail)
            stateTtlMs.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
      }
  }
}
