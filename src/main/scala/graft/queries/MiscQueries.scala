package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ext.Multimodal
import graft.operators.Sketches

/** Multimodal featurization and sketch-based approximate distincts — both
  * fully oracle-checked: the q32 stub codec derives features from portable
  * md5, and q33 uses the from-scratch portable HLL (Sketches.hllDistinct)
  * whose integer-exact register math DuckDB reproduces bit-for-bit. */
object MiscQueries {

  /** q32: multimodal decode pipeline over the demo media table — binary
    * columns in, per-media feature rows out (stub codec, real plumbing). */
  def q32MediaFeatures(spark: SparkSession, dir: String): DataFrame =
    Multimodal.mediaFeatures(spark, dir)

  /** q33: sketch aggregates — portable HLL estimate next to the exact
    * count per group, with the relative error surfaced as exact e4 fixed
    * point. At 100 TB the sketch is the only affordable distinct; the
    * exact column is the test. */
  def q33ApproxDistinct(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables(spark, dir, "orders")
    val exact = orders.groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("exact_custs"))
    val est = Sketches.hllDistinct(orders, Seq("o_orderpriority"), "o_custkey")
    exact.join(broadcast(est), Seq("o_orderpriority"))
      .withColumn("rel_err_e4",
        floor(abs(col("hll_est_e2") - col("exact_custs") * 100) /
          (col("exact_custs") * lit(100.0)) * 10000 + 0.5).cast("long"))
      .orderBy(col("o_orderpriority"))
  }

  /** q40: distributed-sketch merge — HLL registers built INDEPENDENTLY
    * over two disjoint halves of orders, merged by per-bucket max, must
    * estimate exactly what the single-pass sketch (and the DuckDB oracle)
    * computes. This is the contract that lets 1000 executors sketch
    * locally and merge tiny register frames instead of shuffling rows. */
  def q40HllMerge(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables(spark, dir, "orders")
    val halves = Seq(0, 1).map(p =>
      Sketches.hllRegisters(orders.filter(col("o_orderkey") % 2 === p),
        Seq("o_orderpriority"), "o_custkey"))
    val merged = Sketches.estimateFromRegisters(
      halves.reduce(_ unionByName _), Seq("o_orderpriority"), "merged_e2")
    val direct = Sketches.hllDistinct(orders, Seq("o_orderpriority"), "o_custkey")
      .withColumnRenamed("hll_est_e2", "direct_e2")
    merged.join(direct, Seq("o_orderpriority")).orderBy(col("o_orderpriority"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q32_media_features" -> (q32MediaFeatures _),
    "q33_approx_distinct" -> (q33ApproxDistinct _),
    "q40_hll_merge" -> (q40HllMerge _))

  val oracles: Map[String, String] = Map(
    "q32_media_features" ->
      """SELECT doc_id AS media_id,
         (['image','audio','video'])[CAST(doc_id % 3 + 1 AS INT)] AS kind,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         md5(text) AS content_md5,
         CAST(floor((CASE WHEN b0 >= 128 THEN b0 - 256 ELSE b0 END)/128.0*10000 + 0.5)
              AS BIGINT) AS f0_e4
         FROM (SELECT *, CAST('0x'||substr(md5(text),1,2) AS INT) AS b0 FROM documents)
         ORDER BY media_id""",
    "q33_approx_distinct" -> {
      val hll = Sketches.hllOracleSql("orders", "o_orderpriority", "o_custkey")
      s"""WITH hll AS ($hll),
         ex AS (SELECT o_orderpriority,
             count(DISTINCT o_custkey) AS exact_custs FROM orders GROUP BY 1)
         SELECT ex.o_orderpriority, exact_custs, hll_est_e2,
           CAST(floor(abs(hll_est_e2 - exact_custs*100) /
             (exact_custs*100.0) * 10000 + 0.5) AS BIGINT) AS rel_err_e4
         FROM ex JOIN hll ON ex.o_orderpriority = hll.o_orderpriority
         ORDER BY 1"""
    },
    "q40_hll_merge" -> {
      // register-merge is associative/idempotent, so BOTH columns equal the
      // single-pass estimate the oracle computes once
      val hll = Sketches.hllOracleSql("orders", "o_orderpriority", "o_custkey")
      s"""WITH hll AS ($hll)
         SELECT o_orderpriority, hll_est_e2 AS merged_e2, hll_est_e2 AS direct_e2
         FROM hll ORDER BY 1"""
    })
}
