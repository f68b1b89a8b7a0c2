package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.queries.EventQueries

/** Streaming≡batch: the AvailableNow windowed aggregation over `events`
  * must produce exactly the batch q27 result (SURVEY §2.9 extension). */
class EventStreamSpec extends SparkSpec {

  test("AvailableNow hourly aggregation equals batch q27") {
    val checkpoint = Files.createTempDirectory("graft_ckpt_").toString
    EventStream.runAvailableNow(spark, sf, "stream_hourly", checkpoint)
    val streamed = spark.table("stream_hourly")
    val batch = EventQueries.q27WindowHourly(spark, sf)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty, "stream ⊄ batch")
    assert(batch.exceptAll(streamed).isEmpty, "batch ⊄ stream")
  }

  test("second AvailableNow run over the same checkpoint processes nothing new") {
    val checkpoint = Files.createTempDirectory("graft_ckpt2_").toString
    EventStream.runAvailableNow(spark, sf, "stream_hourly_a", checkpoint)
    val first = spark.table("stream_hourly_a").count()
    // same checkpoint, same source: no new files → state unchanged
    EventStream.runAvailableNow(spark, sf, "stream_hourly_b", checkpoint)
    assert(spark.table("stream_hourly_b").count() <= first)
  }
}
