package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — multi-dimensional clustering for
  * scan pruning, the `rewrite_data_files(strategy => 'sort', sort_order =>
  * 'zorder(...)')` maintenance step of modern table formats.
  *
  * Why it matters at 100 TB: parquet scans prune row groups by per-file
  * min/max. Files laid out in insertion order have tight bounds on ONE
  * column at best; interleaving the bits of two (or more) key columns and
  * range-partitioning on that single z-value gives every file tight bounds
  * on EVERY interleaved dimension at once, so predicates on any of them
  * skip most files. The write is one repartitionByRange (sampled range
  * boundaries — no global sort barrier beyond Spark's standard range
  * exchange) plus an in-partition sort.
  *
  * All bit arithmetic is integer and engine-portable (the q66 oracle
  * reproduces z-values in DuckDB with the same shifts).
  */
object ZOrder {

  /** Morton z-value interleaving the low `bits` bits of two NON-NEGATIVE
    * integer columns: bit i of `a` lands at z-bit 2i, bit i of `b` at
    * 2i+1. Callers with unbounded or signed domains normalize first
    * (mod/scale/rank); 2·bits ≤ 62 keeps the result in a long. */
  def zvalue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && 2 * bits <= 62, s"bits out of range: $bits")
    val (al, bl) = (a.cast("long"), b.cast("long"))
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Re-cluster `df` into `numFiles` z-ordered ranges: range-partition on
    * the z-value, sort within each partition. Each output file then holds
    * one compact rectangle of (a, b) space — write it out and both
    * dimensions prune. */
  def cluster(df: DataFrame, a: String, b: String,
              numFiles: Int, bits: Int = 16): DataFrame = {
    val z = zvalue(col(a), col(b), bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Per-bucket min/max spans of both dimensions under a layout — the
    * "how much would a predicate on each column skip" diagnostic. Buckets
    * are `nBuckets` equal slices of `orderCol`'s [min, max] (integer
    * width_bucket — no global sort, one scalar agg + one grouped agg).
    * Output: (bucket, n_rows, a_span, b_span).
    *
    * Bucket = (o - lo) DIV ceil(span / nBuckets), with ceil computed as
    * `(hi - lo) DIV nBuckets + 1` (exact for integers). Division-only on
    * purpose: the naive `(o - lo) * nBuckets DIV span` silently wraps a
    * signed long once the key span reaches 2^63/nBuckets — which 31-bit
    * z-values (spans up to ~2^62) do hit. The divide form is exact for the
    * full long range and algebra bounds it at nBuckets - 1, no clamp. */
  def layoutStats(df: DataFrame, orderCol: Column, a: String, b: String,
                  nBuckets: Int): DataFrame = {
    val base = df.select(col(a).cast("long").as("__a"),
      col(b).cast("long").as("__b"), orderCol.cast("long").as("__o"))
    val mm = base.agg(min(col("__o")).as("__lo"), max(col("__o")).as("__hi"))
    base.join(broadcast(mm), lit(true))
      .withColumn("bucket",
        expr(s"(__o - __lo) DIV ((__hi - __lo) DIV $nBuckets + 1)"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        (max(col("__a")) - min(col("__a"))).as("a_span"),
        (max(col("__b")) - min(col("__b"))).as("b_span"))
  }
}
