package graft.tools

import org.apache.spark.sql.SparkSession

/** sf1.0 correctness surrogate for q154 (BENCH.md round-8 gate): the
  * oracle-pinned mod-4 sample is disk-infeasible for DuckDB at sf1.0
  * (12.5k sampled docs → 78M exact pairs; measured: 24 min, 79 GB RSS,
  * 58 GB temp spill, killed — the engine runs the same formulation in
  * 35.6 s). The budget knob exists for exactly this: at 100 TB a caller
  * holds the SAMPLE constant by raising the mod. So the scale gate runs
  * the identical operator at sampleMod=32 (~1.5k docs, ~1.2M pairs) and
  * dumps the curve for a DuckDB hash-compare with the same-mod SQL.
  * Run: sbt "runMain graft.tools.Q154Sf1Check [sfDir] [outDir]". */
object Q154Sf1Check {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/sf1.0")
    val out = args.lift(1).getOrElse("target/q154_sf1_mod32")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val t0 = System.nanoTime()
    graft.operators.Dedup.bandingRecallCurve(docs, "doc_id", "text",
      k = 16, b = 4, shingleN = 5, sampleMod = 32)
      .orderBy("bin")
      .coalesce(1).write.mode("overwrite").parquet(out)
    println(f"[q154sf1] engine mod32 ${(System.nanoTime() - t0) / 1e9}%.1f s -> $out")
    spark.stop()
  }
}
