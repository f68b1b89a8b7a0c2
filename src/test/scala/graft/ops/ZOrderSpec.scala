package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.operators.ZOrder

/** Morton z-value bit math, layout stats, and the actual clustering win:
  * z-ordered partitions bound BOTH dimensions tighter than linear ones. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zvalue interleaves bits (a even positions, b odd)") {
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L))
      .toDF("a", "b")
      .select(ZOrder.zvalue(col("a"), col("b")))
      .as[Long].collect().toSeq
    // (3,5): a bits {0,1} -> z {0,2} = 5; b bits {0,2} -> z {1,5} = 34
    assert(got === Seq(0L, 1L, 2L, 39L, (1L << 32) - 1))
  }

  test("layoutStats buckets partition all rows inside [0, n)") {
    val li = Tables(spark, sf, "lineitem")
    val stats = ZOrder.layoutStats(li, col("l_orderkey"),
      "l_partkey", "l_suppkey", nBuckets = 16)
    val (nRows, minB, maxB) = stats
      .agg(sum("n_rows"), min("bucket"), max("bucket"))
      .as[(Long, Long, Long)].head()
    assert(nRows == li.count())
    assert(minB >= 0L && maxB <= 15L)
  }

  test("layoutStats bucket math survives 2^62-scale spans without overflow") {
    // spans this wide wrap the naive (o - lo) * nBuckets long multiply;
    // the division-only form must still land max in the top bucket
    val wide = Seq(0L, 1L << 61, (1L << 62) - 1).toDF("o")
      .withColumn("a", lit(1L)).withColumn("b", lit(1L))
    val got = ZOrder.layoutStats(wide, col("o"), "a", "b", nBuckets = 64)
      .select("bucket").as[Long].collect().toSet
    assert(got === Set(0L, 32L, 63L))
  }

  test("z-clustered partitions bound both keys tighter than linear ones") {
    val li = Tables(spark, sf, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"), col("l_orderkey"))
    def meanSpans(df: org.apache.spark.sql.DataFrame): (Double, Double) =
      df.groupBy(spark_partition_id())
        .agg((max("l_partkey") - min("l_partkey")).as("ps"),
          (max("l_suppkey") - min("l_suppkey")).as("ss"))
        .agg(avg("ps"), avg("ss")).as[(Double, Double)].head()
    val (zPart, zSupp) = meanSpans(
      ZOrder.cluster(li, "l_partkey", "l_suppkey", numFiles = 8))
    val (lPart, lSupp) = meanSpans(
      li.repartitionByRange(8, col("l_orderkey")))
    assert(zPart < lPart / 2,
      s"z-order part span $zPart not clearly tighter than linear $lPart")
    assert(zSupp <= lSupp, s"z-order supp span $zSupp vs linear $lSupp")
  }
}
