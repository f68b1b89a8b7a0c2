package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.operators.BloomFilter

/** Bloom pre-filter contract: zero false negatives (the join result is the
  * plain join's, row for row), a bounded false-positive rate on disjoint
  * keys, real selectivity on the fixture, and a distributed build whose
  * driver footprint is the sketch alone. */
class BloomFilterSpec extends SparkSpec {
  import spark.implicits._

  private lazy val urgent = Tables(spark, sf, "orders")
    .filter(col("o_orderpriority") === "1-URGENT")
    .select(col("o_orderkey"))

  test("no false negatives: every build key passes mightContain") {
    val sketch = BloomFilter.build(urgent, "o_orderkey", mBits = 1 << 14)
    val keys = urgent.as[Long].collect()
    assert(keys.nonEmpty)
    keys.foreach(k => assert(sketch.mightContainValue(k.toString), s"dropped key $k"))
    // and the Column probe agrees with the driver-side probe
    val kept = BloomFilter.semiFilter(urgent, "o_orderkey", sketch).count()
    assert(kept == keys.length.toLong)
  }

  test("false-positive rate on disjoint keys stays under 2x the design rate") {
    val sketch = BloomFilter.build(urgent, "o_orderkey", mBits = 1 << 17, kHashes = 3)
    // probe keys that cannot be in the build set (orderkeys are positive)
    val probes = spark.range(1, 20001).select((-col("id")).as("k"))
    val fps = BloomFilter.semiFilter(probes, "k", sketch).count()
    val n = urgent.count().toDouble
    val design = math.pow(1 - math.exp(-3 * n / (1 << 17).toDouble), 3)
    assert(fps / 20000.0 <= math.max(2 * design, 0.001),
      s"fp rate ${fps / 20000.0} vs design $design (n=$n)")
  }

  test("prefilteredJoin handles same-named keys; semiFilter survives a __bf_h column") {
    val fact = spark.range(1, 1000)
      .select(col("id").as("k"), (col("id") * 2).as("v"),
        lit(99L).as("__bf_h0")) // pre-existing temp-name collision
    val dim = spark.range(1, 100, 7).select(col("id").as("k"))
    val out = BloomFilter.prefilteredJoin(fact, dim, "k", "k", mBits = 1 << 10)
    assert(out.count() === dim.count())
    assert(out.columns.count(_ == "__bf_h0") === 1) // collision column intact
  }

  test("prefilteredJoin returns exactly the plain join's rows") {
    val li = Tables(spark, sf, "lineitem").select(col("l_orderkey"), col("l_quantity"))
    val viaBloom = BloomFilter
      .prefilteredJoin(li, urgent, "l_orderkey", "o_orderkey", mBits = 1 << 14)
      .select(col("l_orderkey"), col("l_quantity"))
    val plain = li.join(urgent, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_quantity"))
    assert(viaBloom.exceptAll(plain).isEmpty && plain.exceptAll(viaBloom).isEmpty)
  }

  test("semiFilter drops most non-matching fact rows on the fixture") {
    val sketch = BloomFilter.build(urgent, "o_orderkey")
    val li = Tables(spark, sf, "lineitem")
    val total = li.count().toDouble
    val kept = BloomFilter.semiFilter(li, "l_orderkey", sketch).count().toDouble
    val matching = li.join(urgent, col("l_orderkey") === col("o_orderkey")).count().toDouble
    // ~1/5 of orders are urgent; the filter should land near the true
    // match count, far below the full scan
    assert(kept < 0.5 * total, s"kept $kept of $total — filter not selective")
    assert(kept >= matching, "filter lost matching rows")
  }

  test("NULL build keys are ignored and cannot clobber real bits") {
    // a NULL key hashes to NULL; its (null, null) aggregate row used to
    // unbox to words(0) = 0 and erase real word-0 bits -> false negatives
    val keys = Seq(Option(1L), Option(2L), Option(3L), None)
      .toDF("k")
    val sketch = BloomFilter.build(keys, "k", mBits = 1 << 10)
    Seq(1L, 2L, 3L).foreach(k =>
      assert(sketch.mightContainValue(k.toString), s"dropped key $k"))
    val kept = BloomFilter.semiFilter(keys.na.drop(), "k", sketch).count()
    assert(kept == 3L)
  }

  test("build aggregates distributed words — sketch size independent of rows") {
    val small = BloomFilter.build(urgent.limit(10), "o_orderkey", mBits = 1 << 10)
    val large = BloomFilter.build(urgent, "o_orderkey", mBits = 1 << 10)
    assert(small.words.length == (1 << 10) / 64)
    assert(large.words.length == (1 << 10) / 64)
  }
}
