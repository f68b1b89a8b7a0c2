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
  * the same shard-index membership on any cluster layout. File NAMES are
  * not stable across runs (Spark embeds a per-job UUID) — the manifest
  * therefore carries the parsed `shard` index, which IS the stable key;
  * rows may also move between the c000/c001 files of one shard when
  * `maxRecordsPerFile` splits it. `maxRecordsPerFile` bounds file size
  * without a second shuffle.
  *
  * The manifest derives from the filesystem listing — no re-scan of the
  * written data. Pass `verifyCounts = true` to pay one line-count
  * read-back (spark.read.text — no JSON parsing, no schema inference)
  * for exact per-file row counts.
  */
object Export {

  /** Write `df` as JSONL shards under `outDir`; returns the manifest
    * (shard, file, bytes[, rows]) sorted by file name. */
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
      .map { st =>
        val name = st.getPath.getName
        (name.stripPrefix("part-").takeWhile(_.isDigit).toInt, name, st.getLen)
      }
      .sortBy(_._2)
    val manifest = files.toDF("shard", "file", "bytes")
    if (!verifyCounts) manifest
    else if (files.isEmpty) manifest.withColumn("rows", lit(0L))
    else {
      // line count via read.text: one scan, no JSON parse, no schema
      // inference — and safe on zero-byte part files
      val counts = spark.read.text(s"$outDir/part-*")
        .select(element_at(split(input_file_name(), "/"), -1).as("file"))
        .groupBy(col("file")).agg(count(lit(1)).as("rows"))
      manifest.join(counts, Seq("file"), "left")
        .select(col("shard"), col("file"), col("bytes"),
          coalesce(col("rows"), lit(0L)).as("rows"))
        .orderBy(col("file"))
    }
  }
}
