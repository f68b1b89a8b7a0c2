package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.fingerprint

/** Streaming deduplication — the exact-dedup operator's streaming twin:
  * drop rows whose canonical content fingerprint was already seen, with
  * the dedup state bounded by a watermark (Spark keeps a fingerprint in
  * state only until the watermark passes its event time — at 100 TB/day
  * unbounded dropDuplicates state is a slow OOM, so the watermark is not
  * optional here).
  *
  * Exactly the `dropDuplicates` surface a curation ingest needs in front
  * of `IncrementalVault`: within-watermark duplicates (retries, replayed
  * batches, mirror crawls) never reach the vault merge.
  */
object StreamingDedup {

  /** Dedup a stream on the canonical text fingerprint. `eventTimeCol` must
    * be a timestamp column; rows older than `watermarkDelay` behind the
    * max seen event time may no longer dedup (state already reclaimed).
    * dropDuplicatesWithinWatermark — NOT plain dropDuplicates, which only
    * evicts state when the event-time column is itself a dedup key and
    * would otherwise grow one state row per distinct fingerprint forever. */
  def byFingerprint(stream: DataFrame, textCol: String, eventTimeCol: String,
                    watermarkDelay: String): DataFrame =
    stream
      .withColumn("__fp", fingerprint(col(textCol)))
      .withWatermark(eventTimeCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /** Dedup on explicit key columns (e.g. event_id) with bounded state. */
  def byKeys(stream: DataFrame, keys: Seq[String], eventTimeCol: String,
             watermarkDelay: String): DataFrame =
    stream.withWatermark(eventTimeCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
}
