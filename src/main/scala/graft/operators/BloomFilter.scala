package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Distributed Bloom-filter semi-join pre-filter — the standard way to cut
  * a 100 TB fact scan down to the rows that can possibly match a selective
  * dimension BEFORE paying the shuffle for the exact join.
  *
  * Shape: the build side's keys hash into a fixed-size bitmap with a
  * distributed aggregation (explode k positions → groupBy word → bit_or),
  * so the build never funnels raw keys through the driver — only the
  * finished sketch (mBits/64 longs, e.g. 64 KB at mBits = 2^19) is
  * collected, a size independent of build-side row count. The probe is a
  * pure Column over built-in expressions (md5/conv/element_at/bitwise),
  * fully codegen'd inside the fact table's scan stage, so non-matching rows
  * die before any exchange. Because a Bloom filter has NO false negatives,
  * `prefilteredJoin` followed by the exact join returns byte-identical
  * results to the plain join — the filter is a pure physical rewrite
  * (proved on the oracle surface by q62, same contract as q61's salting).
  *
  * This mirrors what Spark's own runtime row-level filtering does
  * (spark.sql.optimizer.runtime.bloomFilter.*), expressed as an explicit,
  * engine-portable operator: every hash derives from md5 of an explicit
  * string, so any engine can reproduce the exact bitmap.
  *
  * When it pays: the dim side is too big (or too late-derived) to
  * broadcast, the join is selective on the fact side, and the fact scan +
  * shuffle dominate — then the sketch costs one small agg and saves the
  * shuffle of every non-matching fact row. When the dim broadcasts anyway,
  * the pre-filter is redundant (the hash join discards the same rows); the
  * operator still returns exact results.
  */
object BloomFilter {

  /** A built filter: `words(i)` holds bits [64i, 64i+64). */
  final case class Sketch(words: Array[Long], mBits: Int, kHashes: Int) {
    /** Driver-side membership probe (tests/tools). */
    def mightContainValue(key: String): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
      def h(s: String): Long =
        java.lang.Long.parseLong(
          md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
      val h1 = h(s"bf1:$key"); val h2 = h(s"bf2:$key")
      (0 until kHashes).forall { i =>
        val p = Math.floorMod(h1 + i.toLong * h2, mBits.toLong)
        (words((p >> 6).toInt) & (1L << (p & 63))) != 0
      }
    }
  }

  /** The i-th bit position of `key` (as string) in a mBits-bit filter:
    * double hashing over two independent 60-bit md5-derived hashes. */
  private def position(key: Column, i: Int, mBits: Int): Column = {
    val h1 = TextFunctions.stableHash60(concat(lit("bf1:"), key))
    val h2 = TextFunctions.stableHash60(concat(lit("bf2:"), key))
    pmod(h1 + lit(i.toLong) * h2, lit(mBits.toLong))
  }

  /** Build the filter over `keys(keyCol)` (cast to string). Distributed:
    * one narrow explode + one groupBy on ≤ mBits/64 word indices; only the
    * finished bitmap reaches the driver. */
  def build(keys: DataFrame, keyCol: String,
            mBits: Int = 1 << 19, kHashes: Int = 4): Sketch = {
    require(mBits % 64 == 0 && mBits > 0, s"mBits must be a positive multiple of 64: $mBits")
    require(kHashes >= 1, s"kHashes must be >= 1: $kHashes")
    val key = col(keyCol).cast("string")
    val positions = array((0 until kHashes).map(i => position(key, i, mBits)): _*)
    val wordRows = keys
      .select(explode(positions).as("p"))
      .groupBy((col("p") / 64).cast("int").as("w"))
      .agg(bit_or(call_function("shiftleft", lit(1L), pmod(col("p"), lit(64L)).cast("int"))).as("bits"))
      .collect()
    val words = new Array[Long](mBits / 64)
    wordRows.foreach(r => words(r.getInt(0)) = r.getLong(1))
    Sketch(words, mBits, kHashes)
  }

  /** Membership-test Column: true iff every one of the k bits is set.
    * False positives possible (rate ~ (1-e^{-kn/m})^k), false negatives
    * never — callers MUST keep the exact join after the filter. */
  def mightContain(key: Column, s: Sketch): Column = {
    val bitmap = typedLit(s.words.toSeq)
    (0 until s.kHashes)
      .map { i =>
        val p = position(key.cast("string"), i, s.mBits)
        (element_at(bitmap, (p / 64).cast("int") + 1)
          .bitwiseAND(call_function("shiftleft", lit(1L), pmod(p, lit(64L)).cast("int"))) =!= 0L)
      }
      .reduce(_ && _)
  }

  /** Drop fact rows that cannot match any build-side key. */
  def semiFilter(fact: DataFrame, factKey: String, s: Sketch): DataFrame =
    fact.filter(mightContain(col(factKey), s))

  /** Exact inner join with the Bloom pre-filter on the fact side: builds
    * the sketch from `dim(dimKey)`, filters `fact` before the join, then
    * joins exactly (clearing any false positives). Result ≡ plain join. */
  def prefilteredJoin(fact: DataFrame, dim: DataFrame,
                      factKey: String, dimKey: String,
                      mBits: Int = 1 << 19, kHashes: Int = 4): DataFrame = {
    val sketch = build(dim, dimKey, mBits, kHashes)
    semiFilter(fact, factKey, sketch)
      .join(dim, col(factKey) === col(dimKey))
  }
}
