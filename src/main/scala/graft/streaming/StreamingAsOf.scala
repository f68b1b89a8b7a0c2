package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming as-of enrichment — the streaming twin of `operators.AsOf`.
  *
  * Uses Spark's native stream-stream time-interval join: left rows match
  * right rows of the same key with `l.time - horizon <= r.time <= l.time`.
  * Both sides carry watermarks, so the join state Spark keeps for each side
  * is bounded by watermark delay + horizon — the knob that makes this run
  * forever at 100 TB/day (an unbounded as-of would pin every right row in
  * state for all time).
  *
  * Contract: this emits every in-horizon candidate, not only the latest —
  * Structured Streaming does not support an arbitrary-key argmax after a
  * stream-stream join (chained stateful operators are restricted to
  * time-window aggregations). The per-left-row argmax is a stateless
  * batch step over the emitted candidates (`latestPerLeft`), applied by
  * the sink/finalize layer — StreamingAsOfSpec pins candidates→argmax
  * equal to the batch `AsOf.asofJoin` within the horizon.
  */
object StreamingAsOf {

  /** In-horizon candidate matches. `left`/`right` are streaming frames;
    * columns must be disjoint apart from `keys`. Right rows older than
    * `horizon` behind a left row never match (and leave state once the
    * watermark passes). */
  def candidates(left: DataFrame, right: DataFrame, keys: Seq[String],
                 leftTime: String, rightTime: String,
                 horizon: String, watermarkDelay: String): DataFrame = {
    val l = left.withWatermark(leftTime, watermarkDelay)
    val r = right.withWatermark(rightTime, watermarkDelay)
    l.join(r,
      keys.map(k => l(k) === r(k)).reduce(_ && _) &&
        r(rightTime) <= l(leftTime) &&
        r(rightTime) >= l(leftTime) - expr(s"INTERVAL $horizon"),
      "inner")
      .drop(r(keys.head), keys.tail.map(r(_)): _*)
  }

  /** Finalize step: keep each left row's latest candidate — greatest
    * (rightTime, tieBreak). Stateless; run over the collected candidate
    * output (foreachBatch / AvailableNow finalize). */
  def latestPerLeft(cands: DataFrame, leftId: String,
                    rightTime: String, tieBreak: String): DataFrame = {
    val others = cands.columns.filterNot(_ == leftId)
    cands.groupBy(col(leftId))
      .agg(max_by(struct(others.map(col): _*),
        struct(col(rightTime), col(tieBreak))).as("__m"))
      .select(col(leftId) +: others.map(c => col(s"__m.$c").as(c)): _*)
  }
}
