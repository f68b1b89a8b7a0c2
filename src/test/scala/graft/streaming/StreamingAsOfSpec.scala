package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.AsOf

/** Streaming as-of = batch as-of within the horizon: candidates from the
  * native stream-stream interval join, finalized by latestPerLeft, must
  * equal AsOf.asofJoin restricted to matches inside the horizon. */
class StreamingAsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("candidates→argmax equals batch asofJoin within the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val lSrc = MemoryStream[(Long, Timestamp, String)]
    val rSrc = MemoryStream[(Long, Timestamp, Long, Double)]
    val left = lSrc.toDF().toDF("k", "lt", "tag")
    val right = rSrc.toDF().toDF("k", "rt", "qid", "px")

    val cands = StreamingAsOf.candidates(left, right, Seq("k"),
      "lt", "rt", horizon = "1 HOUR", watermarkDelay = "2 hours")
    val run = cands.writeStream.outputMode("append").format("memory")
      .queryName("asof_cands")
      .option("checkpointLocation", Files.createTempDirectory("graft_sao_").toString)
      .start()
    try {
      rSrc.addData(
        (1L, ts("2024-01-01 10:00:00"), 100L, 1.0),
        (1L, ts("2024-01-01 10:30:00"), 101L, 2.0),
        (1L, ts("2024-01-01 10:30:00"), 102L, 3.0), // same ts: tiebreak
        (2L, ts("2024-01-01 09:00:00"), 200L, 4.0))
      lSrc.addData(
        (1L, ts("2024-01-01 10:45:00"), "a"),  // → 102 (tiebreak over 101)
        (1L, ts("2024-01-01 10:15:00"), "b"),  // → 100
        (2L, ts("2024-01-01 09:30:00"), "c"),  // → 200
        (2L, ts("2024-01-01 11:00:00"), "d"))  // 200 is 2h old → outside horizon
      run.processAllAvailable()

      val got = StreamingAsOf.latestPerLeft(
        spark.table("asof_cands"), "tag", "rt", "qid")
        .select(col("tag"), col("qid")).as[(String, Long)].collect().toMap
      assert(got === Map("a" -> 102L, "b" -> 100L, "c" -> 200L)) // no "d"

      // batch reference: asofJoin + horizon restriction gives the same rows
      val bL = Seq((1L, ts("2024-01-01 10:45:00"), "a"),
        (1L, ts("2024-01-01 10:15:00"), "b"),
        (2L, ts("2024-01-01 09:30:00"), "c"),
        (2L, ts("2024-01-01 11:00:00"), "d")).toDF("k", "lt", "tag")
      val bR = Seq((1L, ts("2024-01-01 10:00:00"), 100L, 1.0),
        (1L, ts("2024-01-01 10:30:00"), 101L, 2.0),
        (1L, ts("2024-01-01 10:30:00"), 102L, 3.0),
        (2L, ts("2024-01-01 09:00:00"), 200L, 4.0)).toDF("k", "rt", "qid", "px")
      val batch = AsOf.asofJoin(bL, bR, Seq("k"), "lt", "rt", "qid",
        Seq("qid", "rt"), prefix = "m_")
        .filter(col("m_rt") >= col("lt") - expr("INTERVAL 1 HOUR"))
        .select(col("tag"), col("m_qid")).as[(String, Long)].collect().toMap
      assert(batch === got)
    } finally run.stop()
  }
}
