package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.core.{Tables, Warehouse}
import graft.operators.{AnnIndex, Similarity}

/** Streaming ingest into the persistent ANN index: embedding batches land
  * as parquet files, an AvailableNow stream assigns ONLY the unseen files
  * against the stored centroids and appends their lists — the serving
  * store's production ingest path. Because assignment is centroid-pure,
  * stream-ingested state must answer queries exactly like a one-shot
  * batch build over the same vectors. */
class StreamingAnnIngestSpec extends SparkSpec {
  import spark.implicits._

  private val embSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  private def rows(df: DataFrame) =
    df.select("q_id", "neighbor_id", "cos_e4", "rank")
      .as[(Long, Long, Long, Int)].collect().sortBy(r => (r._1, r._4)).toSeq

  test("two AvailableNow ingest runs serve exactly like a one-shot batch build") {
    val emb = Tables(spark, sf, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
    val cent = Similarity.kmeansCentroids(emb, k = 8, iters = 2)

    // index seeded with centroids and an EMPTY corpus — ingest fills it
    val srcDir = Files.createTempDirectory("graft_annstream_src_").toString
    val ckpt = Files.createTempDirectory("graft_annstream_ck_").toString
    val wh = new Warehouse(spark, Files.createTempDirectory("graft_annstream_wh_").toString)
    AnnIndex.build(wh, "ann", "emb", emb.filter(lit(false)), cent)

    def ingestAvailable(): Unit = {
      val q = spark.readStream.schema(embSchema).parquet(s"$srcDir/*.parquet")
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, _: Long) =>
          if (!b.isEmpty) AnnIndex.append(wh, "ann", "emb", b)
        }
        .start()
      q.awaitTermination()
    }

    emb.filter(col("vec_id") % 2 === 0)
      .coalesce(1).write.parquet(s"$srcDir/batch1.parquet")
    ingestAvailable()
    emb.filter(col("vec_id") % 2 === 1)
      .coalesce(1).write.parquet(s"$srcDir/batch2.parquet")
    ingestAvailable()
    // a third run sees nothing new and must append nothing
    val before = wh.read("ann", "emb_lists").count()
    ingestAvailable()
    assert(wh.read("ann", "emb_lists").count() === before,
      "an ingest run with no new files must not grow the index")

    val oneShot = new Warehouse(spark,
      Files.createTempDirectory("graft_annstream_full_").toString)
    AnnIndex.build(oneShot, "ann", "emb", emb, cent)
    assert(rows(AnnIndex.topK(wh, "ann", "emb", queries, k = 5)) ===
      rows(AnnIndex.topK(oneShot, "ann", "emb", queries, k = 5)))
  }

  test("stream-ingested index serves q120's oracle-checked query set exactly") {
    // the end-to-end anchor: stream the embeddings fixture into an index
    // in two batches, then serve EXACTLY the workload q120's green oracle
    // row pins (10 query vectors, k=5, probes=2, label-derived centroids)
    // — every row equal to the ad-hoc ivfTopK the oracle hash-checks, so
    // the streaming ingest path is transitively oracle-anchored.
    val emb = Tables(spark, sf, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    val cent = Similarity.ivfCentroids(emb, "label")

    val srcDir = Files.createTempDirectory("graft_annstream2_src_").toString
    val ckpt = Files.createTempDirectory("graft_annstream2_ck_").toString
    val wh = new Warehouse(spark, Files.createTempDirectory("graft_annstream2_wh_").toString)
    AnnIndex.build(wh, "ann", "emb", emb.filter(lit(false)), cent)
    emb.filter(col("vec_id") % 2 === 0)
      .coalesce(1).write.parquet(s"$srcDir/batch1.parquet")
    emb.filter(col("vec_id") % 2 === 1)
      .coalesce(1).write.parquet(s"$srcDir/batch2.parquet")
    val q = spark.readStream.schema(embSchema).parquet(s"$srcDir/*.parquet")
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .option("maxFilesPerTrigger", "1") // two micro-batches, two appends
      .foreachBatch { (b: DataFrame, _: Long) =>
        if (!b.isEmpty) AnnIndex.append(wh, "ann", "emb", b)
      }
      .start()
    q.awaitTermination()

    val served = AnnIndex.topK(wh, "ann", "emb", queries, k = 5, probes = 2)
    val adHoc = Similarity.ivfTopK(queries, emb, cent, k = 5, probes = 2)
    assert(rows(served) === rows(adHoc))
  }
}
