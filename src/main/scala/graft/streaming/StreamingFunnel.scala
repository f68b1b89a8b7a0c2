package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming conversion funnel — q86's windowed funnel (first view → click
  * within `w1` → purchase within `w2` of that click) evaluated continuously
  * per user, with the verdict emitted exactly once when the event-time
  * watermark PROVES it final.
  *
  * Finality argument (all in event time, so replays behave identically):
  *   - the funnel verdict depends only on events with ts ≤ v + w1 + w2
  *     (v = the user's earliest view). Once the watermark passes that
  *     deadline no admissible event can change the verdict: a new view
  *     lowering v would need ts < v, but late events behind the watermark
  *     are dropped, and v + w1 + w2 ≥ v.
  *   - users with no view yet evict once the watermark passes their last
  *     seen event: any future view able to consume a stored click must
  *     precede that click in event time, i.e. would arrive late.
  *
  * State per user: the min view ts plus the click/purchase timestamps
  * still inside the funnel horizon — bounded by events-per-user-per-
  * horizon (small for real funnels), reclaimed by the timeout. One
  * shuffle on user_id; verdicts are one row per converted-or-expired
  * user.
  */
object StreamingFunnel {

  case class FunnelEv(user_id: Long, event_type: String, tsMicros: Long,
                      ts: java.sql.Timestamp)
  /** viewTs = Long.MaxValue until a view arrives. */
  case class FunnelState(viewTs: Long, clicks: List[Long], purchases: List[Long],
                         maxSeen: Long)
  case class FunnelVerdict(user_id: Long, stage: Int)

  val NoView: Long = Long.MaxValue

  /** The funnel verdict from final stats: 0 = never viewed (not emitted),
    * 1 = viewed, 2 = clicked within w1, 3 = purchased within w2 of the
    * click. */
  private[streaming] def verdict(s: FunnelState, w1Us: Long, w2Us: Long): Int = {
    if (s.viewTs == NoView) return 0
    val v = s.viewTs
    val c = s.clicks.filter(t => t > v && t <= v + w1Us)
      .reduceOption(_ min _).getOrElse(-1L)
    if (c < 0) return 1
    val p = s.purchases.filter(t => t > c && t <= c + w2Us)
      .reduceOption(_ min _).getOrElse(-1L)
    if (p < 0) 2 else 3
  }

  private[streaming] def foldFunnel(uid: Long, evs: Iterator[FunnelEv],
                                    state: GroupState[FunnelState],
                                    w1Us: Long, w2Us: Long): Iterator[FunnelVerdict] = {
    if (state.hasTimedOut) {
      val stage = verdict(state.get, w1Us, w2Us)
      state.remove()
      return if (stage >= 1) Iterator.single(FunnelVerdict(uid, stage))
      else Iterator.empty
    }
    var s = state.getOption.getOrElse(FunnelState(NoView, Nil, Nil, 0L))
    evs.foreach { e =>
      s = e.event_type match {
        case "view" => s.copy(viewTs = math.min(s.viewTs, e.tsMicros),
          maxSeen = math.max(s.maxSeen, e.tsMicros))
        case "click" => s.copy(clicks = e.tsMicros :: s.clicks,
          maxSeen = math.max(s.maxSeen, e.tsMicros))
        case "purchase" => s.copy(purchases = e.tsMicros :: s.purchases,
          maxSeen = math.max(s.maxSeen, e.tsMicros))
        case _ => s.copy(maxSeen = math.max(s.maxSeen, e.tsMicros))
      }
    }
    // prune what the current window proves useless: clicks after v + w1
    // can never qualify (v only decreases), purchases after v + w1 + w2
    // likewise; clicks at or before v stay — a later-arriving earlier
    // view can still move the window start down to them
    if (s.viewTs != NoView)
      s = s.copy(clicks = s.clicks.filter(_ <= s.viewTs + w1Us),
        purchases = s.purchases.filter(_ <= s.viewTs + w1Us + w2Us))
    state.update(s)
    // verdict-final deadline (see scaladoc); viewless users hold only
    // until the watermark passes their last event
    val deadlineMs =
      if (s.viewTs != NoView) (s.viewTs + w1Us + w2Us) / 1000L + 1L
      else s.maxSeen / 1000L + 1L
    state.setTimeoutTimestamp(
      math.max(deadlineMs, state.getCurrentWatermarkMs() + 1L))
    Iterator.empty
  }

  /** Continuous funnel verdicts over a watermarked event stream.
    * `watermarkDelay` is the source's allowed out-of-orderness. */
  def streaming(events: Dataset[FunnelEv], w1Us: Long, w2Us: Long,
                watermarkDelay: String = "10 minutes"): Dataset[FunnelVerdict] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (uid: Long, evs: Iterator[FunnelEv], st: GroupState[FunnelState]) =>
          foldFunnel(uid, evs, st, w1Us, w2Us))
  }
}
