package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.StreamingTopK.{KeyEv, SSEntry, TopKRow}

/** Streaming heavy hitters: Space-Saving guarantees, exactness under
  * capacity, windowed emission at the watermark, and bounded state. */
class StreamingTopKSpec extends SparkSpec {
  import spark.implicits._

  private val HourUs = 3600000000L
  private def ts(hours: Double): java.sql.Timestamp =
    new java.sql.Timestamp(1704100000000L + (hours * 3600000L).toLong)
  private def ev(key: String, hours: Double): KeyEv =
    KeyEv(key, ts(hours).getTime * 1000L, ts(hours))
  // tumbling windows align to EPOCH hours, not to the fixture base
  private def wstart(hours: Double): Long = {
    val t = ts(hours).getTime * 1000L; t - t % HourUs
  }

  test("mergeBatch: exact while under capacity, overestimates bounded after") {
    val m = 3
    // 5 distinct keys through a 3-counter summary, one batch
    val batch = Map("a" -> 10L, "b" -> 7L, "c" -> 5L, "d" -> 2L, "e" -> 1L)
    val es = StreamingTopK.mergeBatch(Nil, batch, m)
    assert(es.size === m)
    val n = batch.values.sum
    es.foreach { e =>
      val truth = batch(e.key)
      assert(e.count >= truth, s"${e.key} undercounts")
      assert(e.count - e.err <= truth, s"${e.key} overestimate exceeds err")
      assert(e.err <= n / m, s"${e.key} err above N/m")
    }
    // the guaranteed heavy hitters (true count > N/m ≈ 8) survive
    assert(es.exists(_.key == "a"))
  }

  test("mergeBatch is insensitive to batch splits for exact-capacity keys") {
    val whole = StreamingTopK.mergeBatch(Nil,
      Map("a" -> 5L, "b" -> 3L, "c" -> 1L), 8)
    val split = StreamingTopK.mergeBatch(
      StreamingTopK.mergeBatch(Nil, Map("a" -> 2L, "c" -> 1L), 8),
      Map("a" -> 3L, "b" -> 3L), 8)
    assert(whole.map(e => e.key -> e.count).toMap
      === split.map(e => e.key -> e.count).toMap)
    assert((whole ++ split).forall(_.err === 0L))
  }

  test("streaming: per-window top-k emits once at the watermark, exact under capacity") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[KeyEv]
    val run = StreamingTopK.streaming(src.toDS(), m = 8, k = 2,
        windowUs = HourUs, watermarkDelay = "1 hour").toDF()
      .writeStream.outputMode("append").format("memory").queryName("topk_out")
      .option("checkpointLocation", Files.createTempDirectory("graft_stk_").toString)
      .start()
    try {
      // window [0,1h): a×3, b×2, c×1 — across TWO batches
      src.addData(ev("a", 0.1), ev("b", 0.2), ev("a", 0.3))
      run.processAllAvailable()
      src.addData(ev("c", 0.4), ev("a", 0.5), ev("b", 0.6),
        // window [1h,2h): d×2
        ev("d", 1.2), ev("d", 1.4))
      run.processAllAvailable()
      assert(spark.table("topk_out").isEmpty, "nothing final before the watermark")
      // advance the watermark past window 0's end (+1h lateness)
      src.addData(ev("z", 3.5))
      run.processAllAvailable()
      val got = spark.table("topk_out").as[TopKRow].collect()
        .filter(_.window_start_us == wstart(0.1))
        .sortBy(_.rank)
      assert(got.map(r => (r.key, r.count, r.err, r.rank)).toSeq
        === Seq(("a", 3L, 0L, 1), ("b", 2L, 0L, 2)))
      // window 1 not yet final (its end + lateness = 3h < watermark? 3.5-1=2.5h
      // watermark passed 2h → d's window IS final too)
      val w1 = spark.table("topk_out").as[TopKRow].collect()
        .filter(_.window_start_us == wstart(1.2))
      assert(w1.map(r => (r.key, r.count)).toSeq === Seq(("d", 2L)))
      // no second emission for a closed window
      src.addData(ev("z", 5.0))
      run.processAllAvailable()
      val again = spark.table("topk_out").as[TopKRow].collect()
        .count(_.window_start_us == wstart(0.1))
      assert(again === 2, "closed window emitted twice")
    } finally run.stop()
  }

  test("streaming with capacity > distinct keys equals the batch q104 top-k") {
    implicit val sqlCtx = spark.sqlContext
    // the sf0.001 events fixture replayed as one batch; m=128 exceeds the
    // 100 distinct props.k values, so Space-Saving is exact and the
    // emitted rows must equal the batch query's (same window alignment)
    // keys zero-padded so the stream's STRING tie-break (count desc, key
    // asc) agrees with the batch query's numeric one — rank parity on the
    // many count-1 ties needs identical ordering, not just identical sets
    val fixture = graft.core.Tables(spark, sf, "events")
      .select(org.apache.spark.sql.functions.lpad(
          org.apache.spark.sql.functions.get_json_object(
            org.apache.spark.sql.functions.col("props"), "$.k"), 3, "0").as("key"),
        org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col("ts")).as("tsMicros"),
        org.apache.spark.sql.functions.col("ts"))
      .as[KeyEv].collect().toSeq
    val src = MemoryStream[KeyEv]
    val run = StreamingTopK.streaming(src.toDS(), m = 128, k = 3,
        windowUs = HourUs, watermarkDelay = "1 hour").toDF()
      .writeStream.outputMode("append").format("memory").queryName("topk_parity")
      .option("checkpointLocation", Files.createTempDirectory("graft_stkp_").toString)
      .start()
    try {
      src.addData(fixture: _*)
      run.processAllAvailable()
      val sentinelUs = fixture.map(_.tsMicros).max + 10 * HourUs
      src.addData(KeyEv("zz", sentinelUs, new java.sql.Timestamp(sentinelUs / 1000L)))
      run.processAllAvailable()
      val got = spark.table("topk_parity").as[TopKRow].collect()
        .map(r => (r.window_start_us, r.key.toLong, r.count, r.rank)).toSet
      val want = graft.queries.AnalyticsQueries.q104WindowedTopK(spark, sf)
        .as[(Long, Long, Long, Int)].collect().toSet
      assert(got === want)
      assert(spark.table("topk_parity").as[TopKRow].collect()
        .forall(_.err === 0L), "exact-capacity run must carry zero error")
    } finally run.stop()
  }

  test("state stays at m entries per window under key explosion") {
    val m = 4
    var es: List[SSEntry] = Nil
    (1 to 50).foreach { i =>
      es = StreamingTopK.mergeBatch(es, Map(s"k$i" -> i.toLong), m)
      assert(es.size <= m)
    }
    // the heaviest recent keys dominate the surviving counters
    assert(es.map(_.count).max >= 50L)
  }

  test("summary state and watermark survive a stop/restart from the checkpoint") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val srcDir = Files.createTempDirectory("graft_stkr_src_").toString
    val ckpt = Files.createTempDirectory("graft_stkr_ck_").toString
    // append-mode MEMORY sinks refuse checkpoint recovery; a parquet sink
    // is the fault-tolerant surface a real deployment uses anyway
    val outDir = Files.createTempDirectory("graft_stkr_out_").toString
    val schema = StructType(Seq(StructField("key", StringType),
      StructField("tsMicros", LongType), StructField("ts", TimestampType)))
    def runOnce(): Unit = {
      val run = StreamingTopK.streaming(
          spark.readStream.schema(schema).parquet(s"$srcDir/*.parquet").as[KeyEv],
          m = 8, k = 2, windowUs = HourUs, watermarkDelay = "1 hour").toDF()
        .writeStream.outputMode("append").format("parquet")
        .option("path", outDir)
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt).start()
      run.awaitTermination()
    }
    // run 1: half of window 0's events, then STOP — counts live only in
    // the checkpointed GroupState now
    Seq(ev("a", 0.1), ev("b", 0.2), ev("a", 0.3)).toDF()
      .coalesce(1).write.parquet(s"$srcDir/b1.parquet")
    runOnce()
    assert(spark.read.parquet(outDir).isEmpty)
    // run 2: the rest of window 0 plus a watermark-advancing event; the
    // restored state must fold in the new rows, and the window emits
    // counts spanning BOTH runs exactly once
    Seq(ev("c", 0.4), ev("a", 0.5), ev("b", 0.6), ev("z", 3.5)).toDF()
      .coalesce(1).write.parquet(s"$srcDir/b2.parquet")
    runOnce()
    // one more tick so the advanced watermark fires the timeouts
    Seq(ev("z", 4.0)).toDF().coalesce(1).write.parquet(s"$srcDir/b3.parquet")
    runOnce()
    val got = spark.read.parquet(outDir).as[TopKRow].collect()
      .filter(_.window_start_us == wstart(0.1)).sortBy(_.rank)
    assert(got.map(r => (r.key, r.count, r.err, r.rank)).toSeq
      === Seq(("a", 3L, 0L, 1), ("b", 2L, 0L, 2)))
  }
}
