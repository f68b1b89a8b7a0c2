package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters — top-k keys per tumbling event-time window via
  * a Space-Saving summary (Metwally et al.), emitted exactly once when the
  * watermark proves the window closed.
  *
  * Why a sketch: an exact windowed count needs state proportional to the
  * window's DISTINCT keys — unbounded for url/token-shaped keys. A
  * Space-Saving summary caps state at `m` counters per window and keeps
  * the classic guarantees: every stored count overestimates the true
  * count by at most its recorded `err`, err ≤ N/m (N = window volume),
  * and any key with true count > N/m is guaranteed present — so the
  * emitted top-k is exact whenever the k-th/(k+1)-th true-count gap
  * exceeds the error band, and the emitted (count, err) pair lets the
  * consumer see the uncertainty.
  *
  * Determinism: each micro-batch's events are counted EXACTLY first, then
  * merged into the summary in (batch count desc, key asc) order with the
  * minimum victim chosen by (count asc, key asc) — so a batch's internal
  * iterator order never changes the result; only micro-batch BOUNDARIES
  * do, which checkpoint replay reproduces (the summary's guarantees hold
  * for any boundary placement).
  *
  * State: ≤ m entries per OPEN window; windows emit and DROP their state
  * at the watermark (closed windows cannot see more rows — later arrivals
  * are late by definition and the watermark filter removes them), so
  * total state is m × (windows inside the lateness horizon). One shuffle
  * on the window key.
  */
object StreamingTopK {

  case class KeyEv(key: String, tsMicros: Long, ts: java.sql.Timestamp)
  case class SSEntry(key: String, count: Long, err: Long)
  case class TopKState(entries: List[SSEntry])
  case class TopKRow(window_start_us: Long, key: String,
                     count: Long, err: Long, rank: Int)

  /** Merge one micro-batch's exact per-key counts into a Space-Saving
    * summary of capacity m — deterministic given the batch multiset. */
  private[streaming] def mergeBatch(entries: List[SSEntry],
                                    batch: Map[String, Long],
                                    m: Int): List[SSEntry] = {
    var es = entries
    batch.toSeq.sortBy { case (k, c) => (-c, k) }.foreach { case (key, c) =>
      es.indexWhere(_.key == key) match {
        case i if i >= 0 => es = es.updated(i, es(i).copy(count = es(i).count + c))
        case _ if es.size < m => es = SSEntry(key, c, 0L) :: es
        case _ =>
          val victim = es.minBy(e => (e.count, e.key))
          es = SSEntry(key, victim.count + c, victim.count) ::
            es.filterNot(_ eq victim)
      }
    }
    es
  }

  private[streaming] def fold(windowStartUs: Long, evs: Iterator[KeyEv],
                              state: GroupState[TopKState],
                              m: Int, k: Int, windowUs: Long): Iterator[TopKRow] = {
    if (state.hasTimedOut) {
      // closed window: emit the ranked top-k, then DROP the state — the
      // watermark filter guarantees no further rows for this window
      val ranked = state.get.entries
        .sortBy(e => (-e.count, e.key)).take(k).zipWithIndex
        .map { case (e, i) =>
          TopKRow(windowStartUs, e.key, e.count, e.err, i + 1) }
      state.remove()
      return ranked.iterator
    }
    val batch = evs.foldLeft(Map.empty[String, Long]) { (acc, e) =>
      acc.updated(e.key, acc.getOrElse(e.key, 0L) + 1L)
    }
    val s = state.getOption.getOrElse(TopKState(Nil))
    state.update(TopKState(mergeBatch(s.entries, batch, m)))
    // the window is final once the watermark passes its end
    val endMs = (windowStartUs + windowUs) / 1000L + 1L
    state.setTimeoutTimestamp(math.max(endMs, state.getCurrentWatermarkMs() + 1L))
    Iterator.empty
  }

  /** Continuous per-window top-k over a watermarked keyed stream.
    * `windowUs` is the tumbling window length in event-time micros. */
  def streaming(events: Dataset[KeyEv], m: Int, k: Int, windowUs: Long,
                watermarkDelay: String = "10 minutes"): Dataset[TopKRow] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(e => e.tsMicros - math.floorMod(e.tsMicros, windowUs))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (w: Long, evs: Iterator[KeyEv], st: GroupState[TopKState]) =>
          fold(w, evs, st, m, k, windowUs))
  }
}
