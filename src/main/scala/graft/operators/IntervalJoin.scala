package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join — match point rows into [start, end) windows per
  * key — via bucket decomposition, the scalable alternative to the
  * BroadcastNestedLoopJoin Catalyst plans for `t >= s AND t < e`.
  *
  * Shape: points land in exactly one fixed-width time bucket (row-local);
  * each window explodes to the buckets its span covers (span/bucketUs + 1
  * rows — pick bucketUs near the typical window length so this stays ~2).
  * The join is then a plain equi-join on (key, bucket) followed by the
  * range predicate as a cheap post-filter. Each (window, point) pair meets
  * in exactly one bucket — the point's — so no dedup stage is needed.
  *
  * Cost at scale: one shuffle of each side on uniform (key, bucket) keys;
  * the candidate fan-in per bucket is bounded by that bucket's own
  * density, never |windows|·|points|.
  */
object IntervalJoin {

  /** Inner-join pairs: every (window row ++ point row) with matching key
    * and startUs <= tsUs < endUs. Window/point column sets must be
    * disjoint apart from `keys`. Timestamps are epoch-microsecond longs. */
  def intervalJoin(windows: DataFrame, points: DataFrame, keys: Seq[String],
                   startUs: String, endUs: String, tsUs: String,
                   bucketUs: Long): DataFrame = {
    // empty/inverted windows match nothing — and must not reach sequence(),
    // which DESCENDS when its bounds invert
    val w = windows.filter(col(endUs) > col(startUs)).withColumn("__bkt",
      explode(sequence(floor(col(startUs) / bucketUs).cast("long"),
        floor((col(endUs) - 1) / bucketUs).cast("long"))))
    val p = points.withColumn("__bkt", floor(col(tsUs) / bucketUs).cast("long"))
    w.join(p, keys :+ "__bkt")
      .filter(col(tsUs) >= col(startUs) && col(tsUs) < col(endUs))
      .drop("__bkt")
  }
}
