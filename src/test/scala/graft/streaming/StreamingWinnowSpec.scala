package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.core.{Tables, Warehouse}
import graft.operators.Dedup

/** Streaming winnowing ingest: document batches land as parquet files, an
  * AvailableNow stream fingerprints ONLY the unseen files and appends to
  * the store; containment queries serve from the accumulated fingerprints
  * — anchored to the oracle-pinned q161: after streaming the corpus in two
  * batches the store-served containment pairs must equal the one-shot
  * full-corpus run row-for-row, INCLUDING the retroactive
  * stop-fingerprint effect (a fingerprint rare in batch 1 that crosses
  * the doc-freq cap once batch 2 lands must mute its batch-1 rows too —
  * which is exactly why the store holds raw fingerprints, not pairs). */
class StreamingWinnowSpec extends SparkSpec {
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  private def pairSet(df: DataFrame) =
    df.select("a_id", "b_id", "shared", "cont_a_e4", "cont_b_e4")
      .as[(Long, Long, Long, Long, Long)].collect().toSet

  test("stream-ingested fingerprints serve q161's oracle-checked containment " +
    "result; re-runs ingest nothing; every doc fingerprints exactly once") {
    val docs = Tables(spark, sf, "documents").select(col("doc_id"), col("text"))
    val srcDir = Files.createTempDirectory("graft_swn_src_").toString
    val ckpt = Files.createTempDirectory("graft_swn_ck_").toString
    val wh = new Warehouse(spark, Files.createTempDirectory("graft_swn_wh_").toString)
    docs.filter(col("doc_id") % 2 === 0)
      .coalesce(1).write.parquet(s"$srcDir/batch1.parquet")
    docs.filter(col("doc_id") % 2 === 1)
      .coalesce(1).write.parquet(s"$srcDir/batch2.parquet")
    def ingestAvailable(): Unit = {
      val q = spark.readStream.schema(docSchema)
        .option("maxFilesPerTrigger", "1") // two micro-batches
        .parquet(s"$srcDir/*.parquet")
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, _: Long) =>
          StreamingWinnow.ingestBatch(wh, "dd", "wn", b, "doc_id", "text")
        }
        .start()
      q.awaitTermination()
    }
    ingestAvailable()

    // the anchor: store-served containment == the one-shot q161 derivation
    val full = pairSet(Dedup.containmentPairs(docs, "doc_id", "text",
      minContainE4 = 6000L))
    assert(full.nonEmpty, "fixture must contain containment pairs")
    assert(pairSet(StreamingWinnow.containmentPairs(wh, "dd", "wn", "doc_id",
      minContainE4 = 6000L)) === full)

    // a re-run with no new files must append nothing (checkpointed source)
    val before = StreamingWinnow.fingerprints(wh, "dd", "wn").count()
    ingestAvailable()
    assert(StreamingWinnow.fingerprints(wh, "dd", "wn").count() === before,
      "an ingest run with no new files must not grow the fingerprint store")

    // every doc's fingerprints extracted exactly once: per-doc rows in the
    // store equal a fresh one-shot extraction's per-doc rows
    val oneShot = Dedup.winnowingFingerprintRows(docs, "doc_id", "text")
      .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    val stored = StreamingWinnow.fingerprints(wh, "dd", "wn")
      .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(stored === oneShot)
  }
}
