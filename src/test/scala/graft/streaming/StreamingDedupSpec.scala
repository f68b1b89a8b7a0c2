package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("streaming dedup drops within-watermark duplicates across batches") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, String, java.sql.Timestamp)]
    val ts = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val stream = src.toDF().toDF("event_id", "text", "ts")
    val run = StreamingDedup.byFingerprint(stream, "text", "ts", "1 hour")
      .writeStream.outputMode("append").format("memory").queryName("dedup_out")
      .option("checkpointLocation", Files.createTempDirectory("graft_sdd_").toString)
      .start()
    try {
      src.addData((1L, "the same document", ts), (2L, "the same document", ts),
        (3L, "a different document", ts))
      run.processAllAvailable()
      assert(spark.table("dedup_out").count() === 2) // exact dup dropped in-batch

      // the same content arriving in a LATER batch is still a duplicate
      src.addData((4L, "THE  SAME   document", ts)) // canonical-equal (case/ws)
      run.processAllAvailable()
      assert(spark.table("dedup_out").count() === 2,
        "cross-batch canonical duplicate must be dropped by state")
      val kept = spark.table("dedup_out").select("event_id").as[Long].collect().toSet
      assert(kept === Set(1L, 3L))
    } finally run.stop()
  }

  test("byKeys dedups on explicit keys with bounded state") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, java.sql.Timestamp)]
    val ts = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val run = StreamingDedup.byKeys(src.toDF().toDF("event_id", "ts"),
        Seq("event_id"), "ts", "30 minutes")
      .writeStream.outputMode("append").format("memory").queryName("dedup_keys_out")
      .option("checkpointLocation", Files.createTempDirectory("graft_sdk_").toString)
      .start()
    try {
      src.addData((1L, ts), (1L, ts), (2L, ts))
      run.processAllAvailable()
      assert(spark.table("dedup_keys_out").count() === 2)
    } finally run.stop()
  }
}
