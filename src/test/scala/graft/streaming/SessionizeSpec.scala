package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Sessionization: batch window formulation vs flatMapGroupsWithState
  * streaming fold produce identical sessions; session math on crafted data. */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def micros(min: Long): Long = min * 60L * 1000000L

  test("session math: gap splits, counts, bounds") {
    val evs = Seq(
      // user 1: two sessions (gap 45min > 30min)
      (1L, 1L, micros(0)), (1L, 2L, micros(10)), (1L, 3L, micros(55)),
      // user 2: one session, order shuffled on input
      (2L, 5L, micros(20)), (2L, 4L, micros(0))
    ).toDF("user_id", "event_id", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = Sessionize.batch(evs).orderBy("user_id", "session_id")
      .select("user_id", "session_id", "n_events").as[(Long, Long, Long)].collect()
    assert(out === Seq((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 2L)))
  }

  test("session-gap curve (q158): monotone in gap, g=1800 equals the q34 " +
    "session count, mean length replays") {
    val got = graft.queries.EventQueries.q158SessionGapCurve(spark, sf)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq === Seq(600L, 1800L, 3600L))
    // a longer gap can only merge sessions, never split them
    assert(got.map(_._2).toSeq === got.map(_._2).toSeq.sorted.reverse)
    val nEvents = Tables(spark, sf, "events").count()
    got.foreach { case (_, ns, n, m) =>
      assert(n === nEvents)
      assert(m === n * 10000L / ns)
      assert(ns >= 1L && ns <= n)
    }
    // cross-query consistency: the 1800 s point IS q34's session count
    val q34Sessions = Sessionize.batch(Tables(spark, sf, "events")).count()
    assert(got.find(_._1 === 1800L).get._2 === q34Sessions)
  }

  test("streaming flatMapGroupsWithState equals batch on AvailableNow input") {
    val batchResult = Sessionize.batch(Tables(spark, sf, "events"))
      .select(col("user_id"), col("session_id"),
        col("session_start"), col("session_end"), col("n_events"))
    // same events through the typed streaming fold (single batch = whole set)
    val typed = Tables(spark, sf, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tsMicros"))
      .as[Sessionize.Ev]
    // run the fold directly (the operator body) grouped like the stream would
    val folded = typed.groupByKey(_.user_id).flatMapGroups { (uid, evs) =>
      var sid = 0L
      val sorted = evs.toSeq.sortBy(e => (e.tsMicros, e.event_id))
      val out = scala.collection.mutable.ListBuffer.empty[Sessionize.Session]
      var open: Option[Sessionize.OpenSession] = None
      sorted.foreach { e =>
        open match {
          case Some(s) if e.tsMicros - s.lastMicros <= 1800L * 1000000L =>
            open = Some(s.copy(lastMicros = e.tsMicros, nEvents = s.nEvents + 1))
          case Some(s) =>
            sid += 1; out += Sessionize.Session(uid, sid, s.startMicros, s.lastMicros, s.nEvents)
            open = Some(Sessionize.OpenSession(e.tsMicros, e.tsMicros, 1))
          case None => open = Some(Sessionize.OpenSession(e.tsMicros, e.tsMicros, 1))
        }
      }
      open.foreach { s =>
        sid += 1; out += Sessionize.Session(uid, sid, s.startMicros, s.lastMicros, s.nEvents)
      }
      out.iterator
    }.toDF()
      .select(col("user_id"), col("session_id"),
        date_format(timestamp_micros(col("session_start_us")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(timestamp_micros(col("session_end_us")), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        col("n_events"))
    assert(folded.exceptAll(batchResult).isEmpty && batchResult.exceptAll(folded).isEmpty)
  }

  test("event-time timeout flushes the open session and clears state") {
    import org.apache.spark.sql.streaming.TestGroupState
    // a user with one open session (2 events) and 3 sessions already emitted
    val st = TestGroupState.create[Sessionize.OpenSession](
      org.apache.spark.api.java.Optional.of(
        Sessionize.OpenSession(micros(0), micros(10), 2, emitted = 3)),
      org.apache.spark.sql.catalyst.plans.logical.EventTimeTimeout,
      batchProcessingTimeMs = 0L, eventTimeWatermarkMs = org.apache.spark.api.java.Optional.of(micros(50) / 1000),
      hasTimedOut = true)
    val out = Sessionize.foldSessions(7L, Iterator.empty, st, 1800L).toList
    assert(out === List(Sessionize.Session(7L, 4L, micros(0), micros(10), 2)))
    // state collapses to a counter tombstone so numbering survives the flush
    assert(!st.isRemoved && st.get === Sessionize.OpenSession(0L, 0L, 0L, 4L))
  }

  test("a user returning after an idle flush continues session numbering") {
    import org.apache.spark.sql.streaming.TestGroupState
    val st = TestGroupState.create[Sessionize.OpenSession](
      org.apache.spark.api.java.Optional.of(
        Sessionize.OpenSession(0L, 0L, 0L, 4L)), // tombstone: 4 sessions emitted
      org.apache.spark.sql.catalyst.plans.logical.EventTimeTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.of(0L),
      hasTimedOut = false)
    // two events separated by more than the gap → the first closes as #5
    val evs = Iterator(Sessionize.Ev(7L, 1L, micros(100)), Sessionize.Ev(7L, 2L, micros(200)))
    val out = Sessionize.foldSessions(7L, evs, st, 1800L).toList
    assert(out === List(Sessionize.Session(7L, 5L, micros(100), micros(100), 1)),
      s"numbering must continue at 5, got $out")
    assert(st.get.emitted === 5L && st.get.nEvents === 1L)
  }

  test("fold sets an event-time timeout at last_event + gap") {
    import org.apache.spark.sql.streaming.TestGroupState
    val st = TestGroupState.create[Sessionize.OpenSession](
      org.apache.spark.api.java.Optional.empty[Sessionize.OpenSession](),
      org.apache.spark.sql.catalyst.plans.logical.EventTimeTimeout,
      batchProcessingTimeMs = 0L, eventTimeWatermarkMs = org.apache.spark.api.java.Optional.of(0L),
      hasTimedOut = false)
    val evs = Iterator(Sessionize.Ev(7L, 1L, micros(0)), Sessionize.Ev(7L, 2L, micros(10)))
    assert(Sessionize.foldSessions(7L, evs, st, 1800L).isEmpty)
    assert(st.getTimeoutTimestampMs.get() === micros(10) / 1000 + 1800L * 1000)
  }

  test("streaming operator emits exactly the gap-closed sessions") {
    import java.nio.file.Files
    val typedStream = EventStream.readEvents(spark, sf)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tsMicros"))
      .as[Sessionize.Ev]
    val q = Sessionize.streaming(typedStream).toDF()
      .writeStream.outputMode("append").format("memory").queryName("sessions_out")
      .option("checkpointLocation", Files.createTempDirectory("graft_sess_").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("sessions_out")
    // continuous semantics with event-time timeout: every gap-closed
    // session emits, plus the open session of each user the final
    // watermark (max ts - 10 min delay) proved idle past the gap. Users
    // still active near the end of input keep their session in state.
    val batch = Sessionize.batch(Tables(spark, sf, "events"))
    val batchClosed = batch.join(
      batch.groupBy("user_id").agg(max(col("session_id")).as("last_sid")), "user_id")
      .filter(col("session_id") < col("last_sid"))
      .select(col("user_id"), col("session_id"),
        col("session_start"), col("session_end"), col("n_events"))
    val batchAll = batch.select(col("user_id"), col("session_id"),
      col("session_start"), col("session_end"), col("n_events"))
    val streamedFmt = streamed.select(col("user_id"), col("session_id"),
      date_format(timestamp_micros(col("session_start_us")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
      date_format(timestamp_micros(col("session_end_us")), "yyyy-MM-dd HH:mm:ss").as("session_end"),
      col("n_events"))
    // every streamed session is a batch session (flush never invents rows)
    assert(streamedFmt.exceptAll(batchAll).isEmpty)
    // every gap-closed session was emitted
    assert(batchClosed.exceptAll(streamedFmt).isEmpty)
    // and the timeout actually flushed idle users' final sessions
    assert(streamedFmt.count() > batchClosed.count(),
      "no idle-user session was flushed by the event-time timeout")
  }
}
