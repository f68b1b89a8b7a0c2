package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.IntervalJoin

/** Interval join via bucket decomposition: boundary inclusion/exclusion,
  * windows spanning multiple buckets, key isolation, no duplicate pairs,
  * and equivalence with the naive range join. */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  test("matches [start, end) per key, windows may span buckets") {
    val windows = Seq(
      (1L, 10L, 100L, 250L),  // spans 2 buckets at width 100
      (2L, 10L, 300L, 310L),
      (3L, 99L, 0L, 1000L))   // other key
      .toDF("win_id", "k", "s", "e")
    val points = Seq(
      (10L, 100L, "a"),  // == start → in
      (10L, 249L, "b"),  // just inside
      (10L, 250L, "c"),  // == end → out
      (10L, 305L, "d"),  // window 2
      (99L, 500L, "e"))  // key 99 → window 3 only
      .toDF("k", "t", "tag")
    val got = IntervalJoin.intervalJoin(windows, points, Seq("k"),
      "s", "e", "t", bucketUs = 100L)
      .select(col("win_id"), col("tag")).as[(Long, String)].collect().sorted
    assert(got.toSeq === Seq((1L, "a"), (1L, "b"), (2L, "d"), (3L, "e")))
  }

  test("agrees with the naive range join on random data, with no dup pairs") {
    val rnd = new scala.util.Random(7)
    val windows = (1 to 120).map { i =>
      val s = rnd.nextInt(5000).toLong
      (i.toLong, (i % 5).toLong, s, s + 1 + rnd.nextInt(700).toLong)
    }.toDF("win_id", "k", "s", "e")
    val points = (1 to 400).map { i =>
      ((i % 5).toLong, rnd.nextInt(6000).toLong, i.toLong)
    }.toDF("k", "t", "p_id")
    val fast = IntervalJoin.intervalJoin(windows, points, Seq("k"),
      "s", "e", "t", bucketUs = 256L).select("win_id", "p_id")
    val naive = windows.join(points, Seq("k"))
      .filter(col("t") >= col("s") && col("t") < col("e"))
      .select("win_id", "p_id")
    assert(fast.count() === fast.distinct().count(), "duplicate pairs")
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }
}
