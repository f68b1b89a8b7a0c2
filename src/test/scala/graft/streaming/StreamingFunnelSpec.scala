package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.StreamingFunnel.{FunnelEv, FunnelState, NoView}

/** Streaming funnel: verdict math, cross-batch out-of-order views, and
  * watermark-proved finality. Windows: w1 = 2h, w2 = 24h like q86. */
class StreamingFunnelSpec extends SparkSpec {
  import spark.implicits._

  private val HourUs = 3600000000L
  private val W1 = 2 * HourUs
  private val W2 = 24 * HourUs
  private def ts(hours: Double): java.sql.Timestamp =
    new java.sql.Timestamp(1704100000000L + (hours * 3600000L).toLong)
  private def us(hours: Double): Long = ts(hours).getTime * 1000L
  private def ev(uid: Long, kind: String, hours: Double): FunnelEv =
    FunnelEv(uid, kind, us(hours), ts(hours))

  test("verdict: stage boundaries are strict-after and inclusive-deadline") {
    def v(view: Long, clicks: List[Long], purchases: List[Long]): Int =
      StreamingFunnel.verdict(FunnelState(view, clicks, purchases, 0L), W1, W2)
    assert(v(NoView, List(1L), Nil) === 0)
    assert(v(10L, Nil, Nil) === 1)
    assert(v(10L, List(10L), Nil) === 1)            // click AT the view: not after
    assert(v(10L, List(10L + W1), Nil) === 2)       // deadline inclusive
    assert(v(10L, List(10L + W1 + 1), Nil) === 1)   // one past deadline
    assert(v(10L, List(10L + 1), List(10L + 1 + W2)) === 3)
    assert(v(10L, List(10L + 1), List(10L + 2 + W2)) === 2)
    // the EARLIEST qualifying click anchors the purchase window
    assert(v(10L, List(10L + W1, 10L + 1), List(10L + 1 + W2)) === 3)
  }

  test("cross-batch out-of-order view still completes the funnel") {
    implicit val sqlCtx = spark.sqlContext
    // w1 = 2h, w2 = 3h; allowed lateness 6h so batch-2's earlier view is
    // still admissible after batch 1 advanced the watermark
    val (w1, w2) = (2 * HourUs, 3 * HourUs)
    val src = MemoryStream[FunnelEv]
    val run = StreamingFunnel.streaming(src.toDS(), w1, w2, "6 hours").toDF()
      .writeStream.outputMode("append").format("memory").queryName("funnel_out")
      .option("checkpointLocation", Files.createTempDirectory("graft_sfun_").toString)
      .start()
    try {
      // batch 1: u1 full conversion; u2 click too late; u3 purchase too
      // late; u4 click but never views; u5's CLICK arrives before its view
      src.addData(
        ev(1, "view", 0), ev(1, "click", 1), ev(1, "purchase", 3),
        ev(2, "view", 0), ev(2, "click", 3),
        ev(3, "view", 0), ev(3, "click", 1), ev(3, "purchase", 6),
        ev(4, "click", 1),
        ev(5, "click", 1))
      run.processAllAvailable()
      // batch 2: u5's view arrives AFTER its click (event time 0.5h <
      // click's 1h) — the retained pre-view click must pair with it
      src.addData(ev(5, "view", 0.5))
      run.processAllAvailable()
      // push the watermark past every deadline (max deadline 0.5 + 5h)
      src.addData(ev(99, "view", 20))
      run.processAllAvailable()
      val got = spark.table("funnel_out").as[(Long, Int)].collect().toMap
      assert(got.get(1L).contains(3))
      assert(got.get(2L).contains(1))
      assert(got.get(3L).contains(2))
      assert(!got.contains(4L), "viewless user must not emit")
      assert(got.get(5L).contains(2), "view arriving after its batch-1 click")
    } finally run.stop()
  }

  test("kill and resume from the checkpoint emits each verdict exactly once") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
    val (w1, w2) = (2 * HourUs, 3 * HourUs)
    val srcDir = Files.createTempDirectory("graft_sfr_src_").toString
    val ckpt = Files.createTempDirectory("graft_sfr_ck_").toString
    // idempotent upsert sink: replays may re-deliver a verdict, but only
    // IDENTICAL re-delivery is exactly-once to an upsert sink — any
    // conflicting stage for a user is a real failure
    val seen = new scala.collection.concurrent.TrieMap[Long, Int]
    val conflicts = new java.util.concurrent.atomic.AtomicInteger(0)
    def record(rows: Array[(Long, Int)]): Unit = rows.foreach { case (u, s) =>
      seen.putIfAbsent(u, s).foreach(prev => if (prev != s) conflicts.incrementAndGet())
    }
    def stream(crashOnVerdicts: Boolean) = {
      val src = spark.readStream
        .schema(Seq.empty[FunnelEv].toDS().schema)
        .parquet(s"$srcDir/*.parquet").as[FunnelEv]
      StreamingFunnel.streaming(src, w1, w2, "1 hour").toDF()
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, _: Long) =>
          val rows = b.collect().map(r => (r.getLong(0), r.getInt(1)))
          record(rows)
          if (crashOnVerdicts && rows.nonEmpty)
            throw new RuntimeException("injected crash after sink write")
        }
        .start()
    }
    // file A: u1 converts (0,1,3); u2 clicks late; u3 purchases late;
    // u4 never views; u98 is the watermark sentinel (deadline 35h)
    Seq(ev(1, "view", 0), ev(1, "click", 1), ev(1, "purchase", 3),
      ev(2, "view", 0), ev(2, "click", 3),
      ev(3, "view", 0), ev(3, "click", 1), ev(3, "purchase", 6),
      ev(4, "click", 1),
      ev(98, "view", 30))
      .toDS().coalesce(1).write.parquet(s"$srcDir/a.parquet")
    val run1 = stream(crashOnVerdicts = false)
    run1.awaitTermination()
    // file B pushes the watermark past u98's deadline; this run is KILLED
    // on its first verdict batch after the sink already wrote
    Seq(ev(99, "view", 60)).toDS().coalesce(1).write.parquet(s"$srcDir/b.parquet")
    val crashing = stream(crashOnVerdicts = true)
    intercept[StreamingQueryException](crashing.awaitTermination())
    // resume from the checkpoint: replayed deliveries must be identical,
    // and the final verdict set must match the batch truth
    val run3 = stream(crashOnVerdicts = false)
    run3.awaitTermination()
    assert(conflicts.get() === 0, "a replayed verdict differed from the original")
    assert(seen.toMap === Map(1L -> 3, 2L -> 1, 3L -> 2, 98L -> 1),
      s"got ${seen.toMap}")
  }

  test("streaming verdict counts match the batch windowed funnel") {
    implicit val sqlCtx = spark.sqlContext
    // deterministic synthetic population, all inside one watermark window
    val evs = (1L to 40L).flatMap { u =>
      val base = u.toDouble / 100
      Seq(ev(u, "view", base)) ++
        (if (u % 2 == 0) Seq(ev(u, "click", base + 1)) else Seq(ev(u, "click", base + 3))) ++
        (if (u % 4 == 0) Seq(ev(u, "purchase", base + 5)) else Seq(ev(u, "purchase", base + 30)))
    }
    val src = MemoryStream[FunnelEv]
    val run = StreamingFunnel.streaming(src.toDS(), W1, W2, "10 minutes").toDF()
      .writeStream.outputMode("append").format("memory").queryName("funnel_par")
      .option("checkpointLocation", Files.createTempDirectory("graft_sfp_").toString)
      .start()
    try {
      src.addData(evs: _*)
      run.processAllAvailable()
      src.addData(ev(999, "view", 200)) // close every deadline
      run.processAllAvailable()
      val got = spark.table("funnel_par").filter($"user_id" =!= 999L)
        .as[(Long, Int)].collect()
      // batch truth: all 40 view; evens click within 2h; of those, u%4==0
      // purchase within 24h of the click
      assert(got.length === 40)
      assert(got.count(_._2 >= 1) === 40)
      assert(got.count(_._2 >= 2) === 20)
      assert(got.count(_._2 === 3) === 10)
    } finally run.stop()
  }
}
