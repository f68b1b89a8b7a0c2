package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.AsOf

/** As-of join semantics on hand fixtures: at-or-before matching, equal-time
  * inclusion, tiebreak on simultaneous right rows, no-match nulls, and
  * key isolation. */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("matches the latest right row at or before each left time, per key") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L, 10.0),
      (1L, ts("2024-01-01 10:05:00"), 101L, 11.0),
      (2L, ts("2024-01-01 10:02:00"), 200L, 20.0))
      .toDF("k", "t", "qid", "px")
    val trades = Seq(
      (1L, ts("2024-01-01 10:04:59"), "a"), // before the 10:05 quote → 100
      (1L, ts("2024-01-01 10:05:00"), "b"), // equal time matches → 101
      (2L, ts("2024-01-01 10:01:00"), "c"), // before any key-2 quote → null
      (2L, ts("2024-01-01 11:00:00"), "d")) // → 200, never key 1's quotes
      .toDF("k", "t", "tag")
    val got = AsOf.asofJoin(trades, quotes, Seq("k"), "t", "t", "qid",
      Seq("qid", "px"))
      .select(col("tag"), col("asof_qid"), col("asof_px"))
      .as[(String, Option[Long], Option[Double])].collect()
      .map { case (k, v, p) => k -> ((v, p)) }.toMap
    assert(got === Map(
      "a" -> ((Some(100L), Some(10.0))),
      "b" -> ((Some(101L), Some(11.0))),
      "c" -> ((None, None)),
      "d" -> ((Some(200L), Some(20.0)))))
  }

  test("simultaneous right rows resolve to the greatest tiebreak") {
    val quotes = Seq(
      (1L, ts("2024-01-01 09:00:00"), 5L, 1.0),
      (1L, ts("2024-01-01 09:00:00"), 9L, 2.0), // same ts, higher id wins
      (1L, ts("2024-01-01 09:00:00"), 7L, 3.0))
      .toDF("k", "t", "qid", "px")
    val trades = Seq((1L, ts("2024-01-01 09:30:00"), "x")).toDF("k", "t", "tag")
    val got = AsOf.asofJoin(trades, quotes, Seq("k"), "t", "t", "qid",
      Seq("qid", "px")).select(col("asof_qid"), col("asof_px"))
      .as[(Long, Double)].head()
    assert(got === ((9L, 2.0)))
  }

  test("agrees with the naive range-join + argmax on random data") {
    val rnd = new scala.util.Random(11)
    val right = (1 to 300).map(i =>
      ((i % 7).toLong, ts("2024-01-01 00:00:00").getTime / 1000 + rnd.nextInt(86400), i.toLong))
      .map { case (k, sec, id) => (k, new Timestamp(sec * 1000), id, id * 1.5) }
      .toDF("k", "t", "qid", "px")
    val left = (1 to 500).map(i =>
      ((i % 7).toLong, ts("2024-01-01 00:00:00").getTime / 1000 + rnd.nextInt(90000), s"e$i"))
      .map { case (k, sec, tag) => (k, new Timestamp(sec * 1000), tag) }
      .toDF("k", "t", "tag")
    val fast = AsOf.asofJoin(left, right, Seq("k"), "t", "t", "qid", Seq("qid"))
      .select(col("tag"), col("asof_qid"))
    // naive: all at-or-before right rows, keep the (t, qid)-greatest
    val naive = left.as("l")
      .join(right.as("r"), col("l.k") === col("r.k") && col("r.t") <= col("l.t"), "left")
      .groupBy(col("l.tag").as("tag"))
      .agg(max(struct(col("r.t"), col("r.qid"))).as("m"))
      .select(col("tag"), col("m.qid").as("asof_qid"))
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  test("left columns pass through untouched, in order") {
    val right = Seq((1L, ts("2024-01-01 00:00:00"), 1L, 0.0)).toDF("k", "t", "qid", "px")
    val left = Seq((1L, ts("2024-01-02 00:00:00"), "keep", 42))
      .toDF("k", "t", "note", "extra")
    val out = AsOf.asofJoin(left, right, Seq("k"), "t", "t", "qid", Seq("px"))
    assert(out.columns.toSeq === Seq("k", "t", "note", "extra", "asof_px"))
    assert(out.select("note", "extra").as[(String, Int)].head() === (("keep", 42)))
  }
}
