package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ext.Multimodal

/** Capability demos without a cross-engine oracle (driver records the
  * weaker rows-only check): multimodal featurization and sketch-based
  * approximate aggregation (engine-specific HLL internals). */
object MiscQueries {

  /** q32: multimodal decode pipeline over the demo media table — binary
    * columns in, per-media feature rows out (stub codec, real plumbing). */
  def q32MediaFeatures(spark: SparkSession, dir: String): DataFrame =
    Multimodal.mediaFeatures(spark, dir)

  /** q33: sketch aggregates — approx_count_distinct (HLL++) next to the
    * exact count per group, with the relative error surfaced. At 100 TB the
    * sketch is the only affordable distinct; the exact column is the test. */
  def q33ApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("o_custkey")).as("exact_custs"),
        approx_count_distinct(col("o_custkey"), 0.02).as("approx_custs"))
      .withColumn("rel_err",
        round(abs(col("approx_custs") - col("exact_custs")) /
          col("exact_custs"), 4))
      .orderBy(col("o_orderpriority"))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q32_media_features" -> (q32MediaFeatures _),
    "q33_approx_distinct" -> (q33ApproxDistinct _))

  /** No oracles: q32's stub codec and q33's HLL sketch are engine-specific. */
  val oracles: Map[String, String] = Map.empty
}
