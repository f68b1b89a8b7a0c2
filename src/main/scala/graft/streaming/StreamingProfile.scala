package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming histogram maintenance — the live input to the drift family
  * (Profiler.distributionDrift / ProfileStore): a per-(slice, bucket)
  * COUNT kept by Structured Streaming's native stateful aggregation.
  *
  * State is the histogram itself: slices×buckets rows no matter how many
  * documents stream through, so no watermark is needed for boundedness —
  * the dimensions are bounded by construction (a decile bucket has 11
  * values; slices are a registry). Counts are exactly-once under the
  * state store's semantics, so any sink snapshot equals the batch
  * histogram over the same prefix of the stream (spec-pinned against
  * q135's batch path). Snapshot the sink per crawl/epoch into the
  * ProfileStore and every pairwise drift check replays store-only. */
object StreamingProfile {

  /** Live (slice, bucket) histogram of a stream — the batch histogram
    * derivation applied to a streaming frame (the ProfileStore.snapshot
    * aggregate, column-for-column). Run with outputMode complete
    * (histogram-sized) or update (changed cells per batch; the sink
    * keeps the latest count per cell). */
  def histogramStream(stream: DataFrame, sliceCol: String,
                      bucketCol: String): DataFrame =
    stream.groupBy(col(sliceCol).as("src"), col(bucketCol).as("bk"))
      .agg(count(lit(1)).as("n"))
}
