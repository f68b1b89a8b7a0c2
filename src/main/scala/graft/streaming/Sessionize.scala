package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization of the events stream — both execution shapes:
  *
  *   - `batch`: the declarative two-window formulation (lag → new-session
  *     flag → running sum = session id). One shuffle on user_id feeds both
  *     window passes and the final per-session aggregation (same
  *     partitioning, one Exchange). Fully SQL-expressible → oracle-checked
  *     (q34).
  *   - `streaming`: KeyValueGroupedDataset.flatMapGroupsWithState with
  *     explicit per-user state (open-session accumulator) — the custom
  *     stateful-operator surface; state size is O(users with an open
  *     session), bounded by the state timeout at true streaming scale.
  *
  * Both emit identical sessions for the same input (pinned by
  * SessionizeSpec on Trigger.AvailableNow).
  */
object Sessionize {

  val DefaultGapSeconds = 1800L

  /** Batch sessionize: (user_id, session_id, session_start, session_end,
    * n_events) with `session_id` numbered 1.. per user in time order. */
  def batch(events: DataFrame, gapSeconds: Long = DefaultGapSeconds): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("__prev", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("__new",
        when(col("__prev").isNull ||
          unix_micros(col("ts")) - col("__prev") > gapSeconds * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("__new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        count(lit(1)).as("n_events"))
  }

  case class Ev(user_id: Long, event_id: Long, tsMicros: Long)
  case class OpenSession(startMicros: Long, lastMicros: Long, nEvents: Long,
                         emitted: Long = 0L)
  case class Session(user_id: Long, session_id: Long, session_start_us: Long,
                     session_end_us: Long, n_events: Long)

  /** Per-group session fold with CONTINUOUS semantics: emits sessions
    * CLOSED by a gap in this batch's events; the trailing open session (and
    * the count of sessions already emitted, for session_id continuity)
    * stays in state, so a session spanning a micro-batch boundary is one
    * session, not two, and ids never collide across batches. When the
    * event-time timeout fires (watermark passed last_event + gap), the open
    * session is emitted and the user's state removed — idle users neither
    * lose their final session nor leak state. */
  private[streaming] def foldSessions(userId: Long, evs: Iterator[Ev],
                                      state: GroupState[OpenSession],
                                      gapSeconds: Long): Iterator[Session] = {
    if (state.hasTimedOut) {
      // watermark passed lastMicros + gap with no new events: the open
      // session can never be extended — flush it. State collapses to a
      // TOMBSTONE (nEvents = 0) carrying only the emitted counter, so a
      // user who returns later continues session numbering instead of
      // restarting at 1 (4 longs per historical user — the memory global
      // numbering inherently requires; tombstones register no timeout).
      val s = state.get
      state.update(OpenSession(0L, 0L, 0L, s.emitted + 1))
      return Iterator.single(
        Session(userId, s.emitted + 1, s.startMicros, s.lastMicros, s.nEvents))
    }
    val sorted = evs.toSeq.sortBy(e => (e.tsMicros, e.event_id))
    val out = scala.collection.mutable.ListBuffer.empty[Session]
    // nEvents == 0 marks a tombstone: no open session, counter only
    var open = state.getOption.filter(_.nEvents > 0)
    var emitted = state.getOption.map(_.emitted).getOrElse(0L)
    sorted.foreach { e =>
      open match {
        case Some(s) if e.tsMicros - s.lastMicros <= gapSeconds * 1000000L =>
          open = Some(s.copy(lastMicros = e.tsMicros, nEvents = s.nEvents + 1))
        case Some(s) =>
          emitted += 1
          out += Session(userId, emitted, s.startMicros, s.lastMicros, s.nEvents)
          open = Some(OpenSession(e.tsMicros, e.tsMicros, 1, emitted))
        case None =>
          open = Some(OpenSession(e.tsMicros, e.tsMicros, 1, emitted))
      }
    }
    open match {
      case Some(s) =>
        state.update(s.copy(emitted = emitted))
        // flush the open session once the watermark proves no event can
        // extend it (event-time, not wall-clock: replays behave identically).
        // If the watermark already passed (very late group), fire next batch
        // — setTimeoutTimestamp rejects values at or behind the watermark.
        state.setTimeoutTimestamp(
          math.max(s.lastMicros / 1000L + gapSeconds * 1000L,
            state.getCurrentWatermarkMs() + 1L))
      case None =>
        if (emitted > 0) state.update(OpenSession(0L, 0L, 0L, emitted))
        else state.remove()
    }
    out.iterator
  }

  /** Ev plus the timestamp column the watermark needs. */
  case class EvT(user_id: Long, event_id: Long, tsMicros: Long, ts: java.sql.Timestamp)

  /** Streaming sessionize over a typed event stream. Sessions closed by a
    * gap emit immediately; open sessions of idle users emit when the event
    * -time watermark passes last_event + gap (EventTimeTimeout), so state
    * is bounded by genuinely-active users. `watermarkDelay` is the allowed
    * out-of-orderness of the source. */
  def streaming(events: Dataset[Ev], gapSeconds: Long = DefaultGapSeconds,
                watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .map(e => EvT(e.user_id, e.event_id, e.tsMicros,
        new java.sql.Timestamp(e.tsMicros / 1000L)))
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (uid: Long, evs: Iterator[EvT], st: GroupState[OpenSession]) =>
          foldSessions(uid, evs.map(e => Ev(e.user_id, e.event_id, e.tsMicros)),
            st, gapSeconds))
  }
}
