package graft.core

import java.nio.file.Files
import java.sql.Timestamp
import java.time.LocalDateTime

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Fixture-ingestion guard: `events.ts` has shipped under different
  * physical parquet encodings across driver fixture generations
  * (TIMESTAMP(NANOS) → nanos-as-long, then TIMESTAMP(MICROS) → NTZ).
  * `Tables` must normalize every known encoding to session-tz
  * TimestampType and name the column on anything new — drift here once
  * broke 18 oracle queries with one opaque AnalysisException. */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  // 2024-03-01T12:00:00Z in epoch units
  private val micros = 1709294400000000L
  private val expected = Timestamp.from(java.time.Instant.ofEpochSecond(1709294400L))

  private def loadAsEvents(dir: String): org.apache.spark.sql.DataFrame =
    Tables(spark, dir, "events")

  test("nanos-as-long encoding (legacy fixtures) normalizes to TimestampType") {
    val dir = Files.createTempDirectory("graft_ts_long_").toString
    // under nanosAsLong=true, parquet TIMESTAMP(NANOS) arrives as plain
    // LongType — identical to writing an INT64 column, which Spark can do
    Seq((1L, micros * 1000L, "click")).toDF("event_id", "ts", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = loadAsEvents(dir)
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.select("ts").as[Timestamp].head() === expected)
  }

  test("timestamp[us] NTZ encoding (current fixtures) normalizes to TimestampType") {
    val dir = Files.createTempDirectory("graft_ts_ntz_").toString
    Seq((1L, LocalDateTime.of(2024, 3, 1, 12, 0, 0), "click"))
      .toDF("event_id", "ts", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = loadAsEvents(dir)
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.select("ts").as[Timestamp].head() === expected)
  }

  test("session-tz timestamp encoding passes through unchanged") {
    val dir = Files.createTempDirectory("graft_ts_tz_").toString
    Seq((1L, expected, "click")).toDF("event_id", "ts", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = loadAsEvents(dir)
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.select("ts").as[Timestamp].head() === expected)
  }

  test("unrecognized ts encoding fails loudly, naming the column") {
    val dir = Files.createTempDirectory("graft_ts_bad_").toString
    Seq((1L, "2024-03-01", "click")).toDF("event_id", "ts", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalArgumentException](loadAsEvents(dir))
    assert(e.getMessage.contains("events.ts"))
    assert(e.getMessage.contains("schema drift"))
  }

  test("driver fixture loads with TimestampType ts and sane range") {
    val df = Tables(spark, sf, "events")
    assert(df.schema("ts").dataType === TimestampType)
    val (lo, hi) = df.select(min($"ts"), max($"ts")).as[(Timestamp, Timestamp)].head()
    assert(lo.getTime > 0L && hi.getTime < 4102444800000L) // before year 2100
  }
}
