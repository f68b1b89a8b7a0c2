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
  * horizon for viewed users and watermark-pruned for view-less ones.
  * After a verdict emits, a tombstone marker (empty lists) survives so a
  * returning user never emits twice — batch q86 anchors on the GLOBAL
  * first view, and the marker row per emitted user is the streaming
  * price of that anchor (same precedent as Sessionize's numbering
  * tombstone). One shuffle on user_id; one verdict row per user, ever.
  */
object StreamingFunnel {

  case class FunnelEv(user_id: Long, event_type: String, tsMicros: Long,
                      ts: java.sql.Timestamp)
  /** viewTs = Long.MaxValue until a view arrives; done = verdict already
    * emitted (tombstone — same precedent as Sessionize's counter
    * tombstone, so one user emits at most one verdict however long the
    * stream runs). */
  case class FunnelState(viewTs: Long, clicks: List[Long], purchases: List[Long],
                         maxSeen: Long, done: Boolean = false)
  case class FunnelVerdict(user_id: Long, stage: Int)

  val NoView: Long = Long.MaxValue

  /** Timeout sentinel for tombstoned users: 9999-12-31 in epoch millis. A
    * tombstone re-arming `watermark + 1` instead would time out again on
    * EVERY microbatch, so per-batch timeout processing would grow with
    * lifetime user count; armed once at the far future it never fires, and
    * stray events from a returning user still hit the done-flag drain. */
  private[streaming] val FarFutureMs: Long = 253402300799000L

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
    val watermarkMs = state.getCurrentWatermarkMs()
    if (state.hasTimedOut) {
      val s = state.get
      if (s.done) { // tombstone: verdict already out; keep suppressing
        state.update(s)
        state.setTimeoutTimestamp(FarFutureMs)
        return Iterator.empty
      }
      val stage = verdict(s, w1Us, w2Us)
      if (stage >= 1) {
        // tombstone (empty lists) so a returning user cannot emit a second
        // verdict — batch q86 counts each user once, anchored on the
        // GLOBAL first view; a per-user marker row is the streaming price
        state.update(FunnelState(NoView, Nil, Nil, 0L, done = true))
        state.setTimeoutTimestamp(FarFutureMs)
        return Iterator.single(FunnelVerdict(uid, stage))
      }
      state.remove() // never viewed: nothing emitted, nothing to suppress
      return Iterator.empty
    }
    var s = state.getOption.getOrElse(FunnelState(NoView, Nil, Nil, 0L))
    if (s.done) { // drain the iterator; verdict is already final
      state.update(s)
      state.setTimeoutTimestamp(FarFutureMs)
      return Iterator.empty
    }
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
    // prune what is provably useless so state stays bounded:
    //  - with a view: clicks after v + w1 never qualify (v only
    //    decreases); purchases after v + w1 + w2 likewise; clicks at or
    //    before v stay — a later-arriving earlier view can reach them
    //  - without a view: events at or behind the watermark are dead — a
    //    view able to consume them must precede them in event time and
    //    would arrive late (this is what keeps a view-less bot's state
    //    from growing forever)
    if (s.viewTs != NoView)
      s = s.copy(clicks = s.clicks.filter(_ <= s.viewTs + w1Us),
        purchases = s.purchases.filter(_ <= s.viewTs + w1Us + w2Us))
    else {
      val wmUs = watermarkMs * 1000L
      s = s.copy(clicks = s.clicks.filter(_ > wmUs),
        purchases = s.purchases.filter(_ > wmUs))
    }
    state.update(s)
    // verdict-final deadline (see scaladoc); viewless users hold only
    // until the watermark passes their last event
    val deadlineMs =
      if (s.viewTs != NoView) (s.viewTs + w1Us + w2Us) / 1000L + 1L
      else s.maxSeen / 1000L + 1L
    state.setTimeoutTimestamp(math.max(deadlineMs, watermarkMs + 1L))
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
