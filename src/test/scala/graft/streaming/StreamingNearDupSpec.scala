package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.core.{Tables, Warehouse}
import graft.operators.Dedup

/** Streaming near-dup ingest: document batches land as parquet files, an
  * AvailableNow stream signs ONLY the unseen files, verifies them against
  * the stored signatures, and appends the verified pairs — anchored to
  * the oracle-pinned q20: the accumulated pairs after streaming the
  * corpus in two batches must equal the one-shot full-corpus run
  * row-for-row. */
class StreamingNearDupSpec extends SparkSpec {
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  private def pairSet(df: DataFrame) =
    df.select("a_id", "b_id", "jaccard_e4")
      .as[(Long, Long, Long)].collect().toSet

  test("stream-ingested pairs equal q20's oracle-checked full-corpus run") {
    val docs = Tables(spark, sf, "documents").select(col("doc_id"), col("text"))
    val srcDir = Files.createTempDirectory("graft_sndd_src_").toString
    val ckpt = Files.createTempDirectory("graft_sndd_ck_").toString
    val wh = new Warehouse(spark, Files.createTempDirectory("graft_sndd_wh_").toString)

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
          StreamingNearDup.ingestBatch(wh, "dd", "docs", b, "doc_id", "text")
          ()
        }
        .start()
      q.awaitTermination()
    }
    ingestAvailable()

    // the anchor: accumulated pairs == the one-shot q20 derivation the
    // oracle hash-checks (uncapped-exact, q20's contract)
    val full = pairSet(Dedup.nearDupPairs(docs, "doc_id", "text",
      minJaccard = 0.5, candidatePairBudget = 0L))
    assert(pairSet(StreamingNearDup.pairs(wh, "dd", "docs")) === full)

    // a re-run with no new files must append nothing (checkpointed source)
    val before = StreamingNearDup.pairs(wh, "dd", "docs").count()
    ingestAvailable()
    assert(StreamingNearDup.pairs(wh, "dd", "docs").count() === before,
      "an ingest run with no new files must not grow the pairs table")

    // the signature store signs every doc exactly once
    assert(wh.read("dd", "docs_signatures").select("doc_id").distinct().count()
      === docs.count())
  }

  test("stream-maintained labels equal the one-shot q41 clustering") {
    val docs = Tables(spark, sf, "documents").select(col("doc_id"), col("text"))
    val srcDir = Files.createTempDirectory("graft_sndl_src_").toString
    val ckpt = Files.createTempDirectory("graft_sndl_ck_").toString
    val wh = new Warehouse(spark, Files.createTempDirectory("graft_sndl_wh_").toString)
    // three batches so the label fold runs twice (seed + two increments)
    docs.filter(col("doc_id") % 3 === 0)
      .coalesce(1).write.parquet(s"$srcDir/batch1.parquet")
    docs.filter(col("doc_id") % 3 === 1)
      .coalesce(1).write.parquet(s"$srcDir/batch2.parquet")
    docs.filter(col("doc_id") % 3 === 2)
      .coalesce(1).write.parquet(s"$srcDir/batch3.parquet")
    val q = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$srcDir/*.parquet")
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, _: Long) =>
        StreamingNearDup.ingestBatchWithLabels(wh, "dd", "docs", b, "doc_id", "text")
      }
      .start()
    q.awaitTermination()
    def labelSet(df: DataFrame) = df.select("cluster", "doc_id", "is_canonical")
      .as[(Long, Long, Boolean)].collect().toSet
    val full = labelSet(graft.operators.Clusters.dedupClusters(
      Dedup.nearDupPairs(docs, "doc_id", "text", minJaccard = 0.5,
        candidatePairBudget = 0L)))
    assert(labelSet(StreamingNearDup.labels(wh, "dd", "docs")) === full,
      "streamed label store must equal the one-shot full-corpus clustering")
  }
}
