package graft.ext

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-data export: deterministic JSONL shards + a manifest — the
  * sink a curated corpus leaves the engine through (trainer-side loaders
  * consume newline-delimited JSON shards of bounded size).
  *
  * Sharding is content-defined, not task-defined: rows hash-partition on
  * `shardKey` into exactly `nShards` shards, so the same corpus exports
  * the same shard membership on any cluster layout (file NAMES carry the
  * partition index; re-runs are stable end to end). `maxRecordsPerFile`
  * additionally splits oversized shards without a second shuffle.
  *
  * The manifest derives from the filesystem listing (name, bytes) — no
  * re-scan of the written data. Pass `verifyCounts = true` to pay one
  * read-back for exact per-file row counts (worth it for an archival
  * manifest, skippable for iterative runs).
  */
object Export {

  /** Write `df` as JSONL shards under `outDir`; returns the manifest
    * (file, bytes[, rows]) sorted by file name. */
  def writeJsonlShards(df: DataFrame, outDir: String, nShards: Int,
                       shardKey: String, maxRecordsPerFile: Long = 1L << 20,
                       verifyCounts: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.repartition(nShards, col(shardKey))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .json(outDir)
    val fs = new Path(outDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new Path(outDir)).toSeq
      .filter(_.getPath.getName.startsWith("part-"))
      .map(st => (st.getPath.getName, st.getLen))
      .sortBy(_._1)
    val manifest = files.toDF("file", "bytes")
    if (!verifyCounts) manifest
    else {
      val counts = spark.read.json(s"$outDir/part-*")
        .select(element_at(split(input_file_name(), "/"), -1).as("file"))
        .groupBy(col("file")).agg(count(lit(1)).as("rows"))
      manifest.join(counts, Seq("file"), "left")
        .select(col("file"), col("bytes"), coalesce(col("rows"), lit(0L)).as("rows"))
        .orderBy(col("file"))
    }
  }
}
