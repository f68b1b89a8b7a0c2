package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.core.{Tables, Warehouse}
import graft.operators.{Decontaminate, DecontamStore}

/** Decontam lifecycle: benchmark gram hashes persist once (per-benchmark
  * appends), corpus batches stream through the frozen store, and the
  * accumulated verdicts equal the one-shot check row-for-row — the
  * store-parity anchor q169 pins against q42's oracle, exercised here
  * through a REAL checkpointed file stream. */
class DecontamStoreSpec extends SparkSpec {
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  private def asMap(df: DataFrame): Map[Long, Long] =
    df.as[(Long, Long)].collect().toMap

  private def docs = Tables(spark, sf, "documents").select(col("doc_id"), col("text"))
  private def evalDocs = docs.filter(col("doc_id") % 97 === 0)
  private def corpus = docs.filter(col("doc_id") % 97 =!= 0)

  test("store-served check equals the one-shot path after split registration; " +
    "multi-n registrations stay isolated") {
    val wh = new Warehouse(spark, Files.createTempDirectory("graft_dcs_wh_").toString)
    DecontamStore.registerBenchmark(wh, "g", "dc", "even",
      evalDocs.filter(col("doc_id") % 2 === 0), "doc_id", "text", n = 4)
    DecontamStore.registerBenchmark(wh, "g", "dc", "odd",
      evalDocs.filter(col("doc_id") % 2 =!= 0), "doc_id", "text", n = 4)
    // a second n on the same store must not perturb n=4 serving
    DecontamStore.registerBenchmark(wh, "g", "dc", "even",
      evalDocs.filter(col("doc_id") % 2 === 0), "doc_id", "text", n = 3)

    val oneShot = asMap(Decontaminate.contaminated(
      corpus, evalDocs, "doc_id", "text", n = 4))
    assert(oneShot.nonEmpty, "fixture must contain contamination")
    assert(asMap(DecontamStore.contaminated(
      wh, "g", "dc", corpus, "doc_id", "text", n = 4)) === oneShot)

    val reg = DecontamStore.registered(wh, "g", "dc")
      .select("bench_id", "n_gram").as[(String, Long)].collect().toSet
    assert(reg === Set(("even", 4L), ("odd", 4L), ("even", 3L)))
  }

  test("streamed corpus batches accumulate verdicts equal to the one-shot " +
    "check; a re-run with no new files appends nothing") {
    val wh = new Warehouse(spark, Files.createTempDirectory("graft_dcv_wh_").toString)
    DecontamStore.registerBenchmark(wh, "g", "dc", "bench",
      evalDocs, "doc_id", "text", n = 4)
    val srcDir = Files.createTempDirectory("graft_dcv_src_").toString
    val ckpt = Files.createTempDirectory("graft_dcv_ck_").toString
    corpus.filter(col("doc_id") % 2 === 0)
      .coalesce(1).write.parquet(s"$srcDir/batch1.parquet")
    corpus.filter(col("doc_id") % 2 =!= 0)
      .coalesce(1).write.parquet(s"$srcDir/batch2.parquet")
    def ingestAvailable(): Unit = {
      val q = spark.readStream.schema(docSchema)
        .option("maxFilesPerTrigger", "1") // two micro-batches
        .parquet(s"$srcDir/*.parquet")
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, _: Long) =>
          DecontamStore.checkBatch(wh, "g", "dc", b, "doc_id", "text", n = 4)
        }
        .start()
      q.awaitTermination()
    }
    ingestAvailable()
    val oneShot = asMap(Decontaminate.contaminated(
      corpus, evalDocs, "doc_id", "text", n = 4))
    assert(asMap(DecontamStore.verdicts(wh, "g", "dc")) === oneShot)

    val before = DecontamStore.verdicts(wh, "g", "dc").count()
    ingestAvailable()
    assert(DecontamStore.verdicts(wh, "g", "dc").count() === before,
      "a run with no new files must not grow the verdict store")
  }

  test("serve plan: corpus side reaches ONE BroadcastHashJoin exchange-free " +
    "(the only hash exchanges are the final aggregate and the store-side " +
    "distinct, which is benchmark-scale)") {
    val wh = new Warehouse(spark, Files.createTempDirectory("graft_dcp_wh_").toString)
    DecontamStore.registerBenchmark(wh, "g", "dc", "bench",
      evalDocs, "doc_id", "text", n = 4)
    val plan = DecontamStore.contaminated(
      wh, "g", "dc", corpus, "doc_id", "text", n = 4)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size === 1, plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 2,
      "an extra shuffle appeared on the serve path:\n" + plan)
  }

  test("attribution accounts for every verdict hit (a corpus gram matching " +
    "k eval docs contributes k attribution rows but one verdict gram)") {
    val wh = new Warehouse(spark, Files.createTempDirectory("graft_dca_wh_").toString)
    DecontamStore.registerBenchmark(wh, "g", "dc", "bench",
      evalDocs, "doc_id", "text", n = 4)
    val attributed = DecontamStore.attribution(
      wh, "g", "dc", corpus, "doc_id", "text", n = 4)
      .agg(sum(col("n_shared_grams"))).as[Long].head()
    val verdictGrams = DecontamStore.contaminated(
      wh, "g", "dc", corpus, "doc_id", "text", n = 4)
      .agg(sum(col("n_eval_grams"))).as[Long].head()
    assert(attributed >= verdictGrams)
    assert(verdictGrams > 0L)
  }
}
