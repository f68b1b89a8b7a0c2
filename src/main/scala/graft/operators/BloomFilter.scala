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
  * Hashing: ONE 60-bit md5-derived hash per row; the k bit positions are
  * its disjoint 20-bit slices (the fixed-cost cousin of Kirsch-
  * Mitzenmacher double hashing — with mBits ≤ 2^20 the slices are
  * independent uniform draws, and the probe costs one md5 however many
  * hash functions the filter uses). Hence kHashes ≤ 3 and mBits a power
  * of two ≤ 2^20; at the default m = 2^19, k = 3, a build side of n = m/16
  * keys gives a ~0.4% false-positive rate — noise the exact join clears.
  *
  * This mirrors what Spark's own runtime row-level filtering does
  * (spark.sql.optimizer.runtime.bloomFilter.*), expressed as an explicit,
  * engine-portable operator: the hash derives from md5 of an explicit
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
      val h = java.lang.Long.parseLong(
        md.digest(s"bf:$key".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(15), 16)
      (0 until kHashes).forall { i =>
        val p = (h >> (20 * i)) & (mBits - 1)
        (words((p >> 6).toInt) & (1L << (p & 63))) != 0
      }
    }
  }

  private def checkParams(mBits: Int, kHashes: Int): Unit = {
    require(mBits >= 64 && mBits <= (1 << 20) && (mBits & (mBits - 1)) == 0,
      s"mBits must be a power of two in [64, 2^20]: $mBits")
    require(kHashes >= 1 && kHashes <= 3,
      s"kHashes must be in [1, 3] (one 20-bit hash slice each): $kHashes")
  }

  /** The single 60-bit hash of `key` (as string). */
  private def hash60(key: Column): Column =
    TextFunctions.stableHash60(concat(lit("bf:"), key.cast("string")))

  /** The i-th bit position: the i-th 20-bit slice of the hash, masked to
    * mBits (power of two). */
  private def position(h: Column, i: Int, mBits: Int): Column =
    shiftright(h, 20 * i).bitwiseAND(lit((mBits - 1).toLong))

  /** Build the filter over `keys(keyCol)` (cast to string). Distributed:
    * one narrow explode + one groupBy on ≤ mBits/64 word indices; only the
    * finished bitmap reaches the driver. */
  def build(keys: DataFrame, keyCol: String,
            mBits: Int = 1 << 19, kHashes: Int = 3): Sketch = {
    checkParams(mBits, kHashes)
    val positions = array((0 until kHashes).map(i =>
      position(col("__h"), i, mBits)): _*)
    // NULL keys never match an equi-join, so they don't belong in the
    // filter — and hash60(null) is null, whose (null, null) aggregate row
    // would unbox to words(0) = 0 and CLOBBER real bits (false negatives)
    val wordRows = keys
      .filter(col(keyCol).isNotNull)
      .select(hash60(col(keyCol)).as("__h"))
      .select(explode(positions).as("p"))
      .groupBy((col("p") / 64).cast("int").as("w"))
      .agg(bit_or(call_function("shiftleft", lit(1L),
        pmod(col("p"), lit(64L)).cast("int"))).as("bits"))
      .collect()
    val words = new Array[Long](mBits / 64)
    wordRows.foreach(r => words(r.getInt(0)) = r.getLong(1))
    Sketch(words, mBits, kHashes)
  }

  /** Membership-test Column over a previously projected hash column. */
  private def bitTests(h: Column, s: Sketch): Column = {
    val bitmap = typedLit(s.words.toSeq)
    (0 until s.kHashes)
      .map { i =>
        val p = position(h, i, s.mBits)
        (element_at(bitmap, (p / 64).cast("int") + 1)
          .bitwiseAND(call_function("shiftleft", lit(1L),
            pmod(p, lit(64L)).cast("int"))) =!= 0L)
      }
      .reduce(_ && _)
  }

  /** Membership-test Column: true iff every one of the k bits is set.
    * False positives possible (rate ~ (1-e^{-kn/m})^k), false negatives
    * never — callers MUST keep the exact join after the filter. */
  def mightContain(key: Column, s: Sketch): Column =
    bitTests(hash60(key), s)

  /** Drop fact rows that cannot match any build-side key. The hash
    * projects once per row into a collision-checked temp column (a fact
    * table that already carries `__bf_h` must not get clobbered); the bit
    * tests reuse it. */
  def semiFilter(fact: DataFrame, factKey: String, s: Sketch): DataFrame = {
    val tmp = Iterator.from(0).map(i => s"__bf_h$i")
      .find(n => !fact.columns.contains(n)).get
    fact.withColumn(tmp, hash60(col(factKey)))
      .filter(bitTests(col(tmp), s))
      .drop(tmp)
  }

  /** Exact inner join with the Bloom pre-filter on the fact side: builds
    * the sketch from `dim(dimKey)`, filters `fact` before the join, then
    * joins exactly (clearing any false positives). Result ≡ plain join.
    * The join condition uses DataFrame-qualified columns so factKey and
    * dimKey may share a name (the common case for semi-join keys) without
    * an ambiguous-reference error. */
  def prefilteredJoin(fact: DataFrame, dim: DataFrame,
                      factKey: String, dimKey: String,
                      mBits: Int = 1 << 19, kHashes: Int = 3): DataFrame = {
    val sketch = build(dim, dimKey, mBits, kHashes)
    val filtered = semiFilter(fact, factKey, sketch)
    filtered.join(dim, filtered(factKey) === dim(dimKey))
  }
}
