package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured-Streaming ingest of the `events` table — the incremental
  * extension of the batch surface (SURVEY §2.9): the reference is pure
  * daily batch, so streaming here reuses the exact batch operators via
  * `Trigger.AvailableNow` (process-everything-then-stop), giving
  * batch-equivalent results with streaming's checkpoint/exactly-once
  * machinery.
  *
  * At scale this is the 100 TB ingest pattern: new parquet files land in a
  * directory; each AvailableNow run processes only files the checkpoint
  * hasn't seen. A production sink runs `hourlyAgg` in APPEND mode to files,
  * where the 1-hour watermark closes windows and purges their state (state
  * tracks the watermark horizon, not history). `runAvailableNow` below
  * instead uses COMPLETE mode into a memory table — that mode retains all
  * window state and emits open windows too, which is exactly what the
  * batch-equivalence verification needs (and only suits verification).
  */
object EventStream {

  def readEvents(spark: SparkSession, sfDir: String): DataFrame = {
    // The file stream source needs an explicit schema; learn it from the
    // fixture's own footer (a driver-side metadata read, no data scan) so
    // the stream tracks the physical ts encoding, which has drifted
    // across fixture generations (see graft.core.Tables.normalizeEventTs).
    val physical = spark.read.parquet(s"$sfDir/events.parquet").schema
    // glob (not bare file path): the file stream source requires a
    // directory/glob so its basePath resolves to the parent directory
    spark.readStream.schema(physical).parquet(s"$sfDir/events.*")
      .withColumn("ts", graft.core.Tables.normalizeEventTs(physical("ts").dataType))
  }

  /** 1-hour tumbling windows per event_type — identical expression tree to
    * the batch q27_window_hourly, plus a watermark for state cleanup. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(graft.functions.TextFunctions.fixedPoint(col("value"), 2)).as("value_cents"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n"), col("value_cents"))

  /** Run the windowed aggregation over all currently-available files into an
    * in-memory table (complete mode: every window, including ones the
    * watermark hasn't closed — matches the batch result exactly). */
  def runAvailableNow(spark: SparkSession, sfDir: String, sinkTable: String,
                      checkpoint: String): StreamingQuery = {
    val q = hourlyAgg(readEvents(spark, sfDir))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(sinkTable)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }
}
