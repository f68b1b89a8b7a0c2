package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.ThetaSketch

/** Streaming KMV/theta sketch: any snapshot equals the batch sketch over
  * the same rows (split- and replay-insensitive), state is one ≤ k-longs
  * buffer per group, and the pair algebra runs unchanged on streamed
  * state. */
class StreamingThetaSpec extends SparkSpec {
  import spark.implicits._

  private def rows(grp: String, lo: Long, hi: Long): Seq[(String, Long)] =
    (lo until hi).map(grp -> _)

  test("streaming sketch == batch sketch; estimates and pair algebra match") {
    implicit val sqlCtx = spark.sqlContext
    val k = 64
    val src = MemoryStream[(String, Long)]
    val run = StreamingSketch.kmvSketchStream(
        src.toDF().toDF("grp", "v"), "grp", "v", k)
      .writeStream.outputMode("complete").format("memory").queryName("kmv_sk")
      .option("checkpointLocation", Files.createTempDirectory("graft_stheta_").toString)
      .start()
    try {
      // three batches with overlap — idempotent merge must absorb replays
      src.addData(rows("a", 0, 300) ++ rows("b", 100, 250): _*)
      run.processAllAvailable()
      src.addData(rows("a", 200, 600) ++ rows("b", 150, 400): _*)
      run.processAllAvailable()
      src.addData(rows("b", 350, 500): _*)
      run.processAllAvailable()
      val streamed = spark.table("kmv_sk")
      val batch = (rows("a", 0, 300) ++ rows("b", 100, 250) ++
        rows("a", 200, 600) ++ rows("b", 150, 400) ++ rows("b", 350, 500))
        .toDF("grp", "v")

      // raw buffers identical row-for-row to the batch sketch
      val expectRaw = ThetaSketch.rawSketch(batch, "grp", "v", k)
      assert(streamed.exceptAll(expectRaw).isEmpty &&
        expectRaw.exceptAll(streamed).isEmpty)

      // state is group-bounded: one row per group, ≤ k hashes each
      val sizes = streamed.selectExpr("grp", "size(hs)").as[(String, Int)].collect()
      assert(sizes.length === 2 && sizes.forall(_._2 <= k))

      // estimator + pair algebra over the STREAMED state == batch q125 math
      val sk = ThetaSketch.withMeta(streamed, "grp", k)
      val got = ThetaSketch.pairwiseOps(sk, "grp", k)
        .select("grp_a", "grp_b", "n_common", "est_intersect", "est_union")
        .as[(String, String, Long, Long, Long)].head()
      val expect = ThetaSketch.pairwiseOps(
          ThetaSketch.sketch(batch, "grp", "v", k), "grp", k)
        .select("grp_a", "grp_b", "n_common", "est_intersect", "est_union")
        .as[(String, String, Long, Long, Long)].head()
      assert(got === expect)
      // overlap sanity: a = {0..599}, b = {100..499} → |a∩b| = 400;
      // σ ≈ 400/√63 ≈ 50, allow ~3σ
      assert(math.abs(got._4 - 400.0) < 160.0)
    } finally run.stop()
  }

  test("stream-ingested sketch state serves q125's oracle-checked estimators exactly") {
    // the end-to-end anchor (the StreamingAnnIngest→q120 pattern): stream
    // the events fixture in two micro-batches, snapshot the sketch state,
    // run EXACTLY q125's estimator chain (k=256 singles + pair algebra)
    // over it, and match the batch q125 query row-for-row — the query the
    // oracle hash-checks, so the streaming sketch path is transitively
    // oracle-anchored.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    val k = 256
    val events = graft.core.Tables(spark, sf, "events")
      .select(col("event_type"), col("user_id"))
    val srcDir = Files.createTempDirectory("graft_stheta_src_").toString
    val ckpt = Files.createTempDirectory("graft_stheta_ck_").toString
    events.filter(col("user_id") % 2 === 0)
      .coalesce(1).write.parquet(s"$srcDir/batch1.parquet")
    events.filter(col("user_id") % 2 === 1)
      .coalesce(1).write.parquet(s"$srcDir/batch2.parquet")
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1") // two micro-batches
      .parquet(s"$srcDir/*.parquet")
    val run = StreamingSketch.kmvSketchStream(stream, "event_type", "user_id", k)
      .writeStream.outputMode("complete").format("memory").queryName("kmv_q125")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .start()
    run.awaitTermination()
    val sk = ThetaSketch.withMeta(spark.table("kmv_q125"), "event_type", k)
    val est = ThetaSketch.estimate(col("n"), col("theta"), k)
    val singles = sk.select(
      col("event_type").as("grp_a"), col("event_type").as("grp_b"),
      col("n").as("n_common"), est.as("est_intersect"), est.as("est_union"))
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("grp_a", "grp_b", "n_common", "est_intersect", "est_union")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    val got = rows(singles.unionByName(ThetaSketch.pairwiseOps(sk, "event_type", k))
      .orderBy(col("grp_a"), col("grp_b")))
    val want = rows(graft.queries.MiscQueries.q125ThetaSketchOps(spark, sf))
    assert(got === want)
  }
}
