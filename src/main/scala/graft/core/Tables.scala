package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loader for the driver-generated parquet fixtures (TESTDATA.md).
  *
  * Every `SparkEntry.queries` entry receives `(spark, sfDir)` and resolves
  * its inputs through here — one place to control scan options. Parquet
  * scans get predicate pushdown + column pruning from Catalyst for free;
  * nothing is cached here (queries are one-shot in Verify/Bench).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS) which Spark has no native type
    // for; sessions set spark.sql.legacy.parquet.nanosAsLong=true, so it
    // arrives as epoch-nanos LongType. Integer-divide (not `/`, which is
    // double and loses precision at 1e18) down to micros.
    if (name == "events")
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
