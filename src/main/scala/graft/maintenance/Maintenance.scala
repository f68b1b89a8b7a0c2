package graft.maintenance

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Warehouse

/** Storage-maintenance jobs — the engine's version of the reference's
  * housekeeping DAGs:
  *   - compaction to ~500 MB files (reference utlis/clean_data.py:49
  *     `optimize(file_size_threshold => '500MB')`, monthly `0 12 1 * *`)
  *   - orphan-file sweep (clean_data.py:52 `remove_orphan_files(30d)` and
  *     the manual listing-vs-catalog set difference in
  *     clean_metadata.py:190-199,397-419, daily `0 6 * * *`)
  *   - metadata-log prune: keep current-month entries, else the latest
  *     (clean_metadata.py:339-343,367-394, monthly `0 12 L * *`)
  *
  * The reference fans these out over ThreadPools of 10-20 workers; here each
  * job is a single Spark action (listing joins are DataFrames) and
  * multi-table fan-out is a plain Scala loop over listTables() — at cluster
  * scale the per-table work is already distributed.
  */
object Maintenance {

  val TargetFileBytes: Long = 500L * 1024 * 1024 // reference clean_data.py:49

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Total bytes of the table's current data files. */
  def tableBytes(spark: SparkSession, wh: Warehouse, schema: String, table: String): Long =
    wh.dataDirs(schema, table).map { d =>
      val p = new Path(d)
      val fs = fsOf(spark, p)
      if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
    }.sum

  /** Rewrite the table into ceil(bytes / 500MB) files — the `optimize` call.
    * Returns the new version (or -1 when the table is already a single
    * right-sized version; idempotent like Iceberg's optimize). */
  def compact(spark: SparkSession, wh: Warehouse, schema: String, table: String,
              targetBytes: Long = TargetFileBytes): Long = {
    val bytes = tableBytes(spark, wh, schema, table)
    val parts = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    wh.overwrite(schema, table, wh.read(schema, table).repartition(parts))
  }

  /** Files on disk MINUS files any retained version references → delete.
    * `retainMs`: only files older than this horizon are deleted (the 30-day
    * guard). Returns deleted paths (sorted, for the housekeeping log). */
  def orphanSweep(spark: SparkSession, wh: Warehouse, schema: String, table: String,
                  retainMs: Long = 0L, now: Long = System.currentTimeMillis()): Seq[String] = {
    val dir = wh.tableDir(schema, table)
    val dataRoot = new Path(s"$dir/data")
    val fs = fsOf(spark, dataRoot)
    if (!fs.exists(dataRoot)) return Seq.empty
    val referenced = (1L to wh.currentVersion(schema, table))
      .flatMap(v => scala.util.Try(wh.dataDirs(schema, table, v)).getOrElse(Seq.empty))
      .map(d => new Path(d).toUri.getPath).toSet
    val orphans = fs.listStatus(dataRoot).toSeq
      .filter(st => !referenced.contains(st.getPath.toUri.getPath))
      .filter(st => now - st.getModificationTime >= retainMs)
      .map(_.getPath)
    orphans.foreach(p => fs.delete(p, true))
    orphans.map(_.toUri.getPath).sorted
  }

  /** Keep current-month metadata-log entries; if none are current-month,
    * keep only the latest entry — the reference's retention policy. Returns
    * deleted log files. */
  def pruneMetadataLog(spark: SparkSession, wh: Warehouse, schema: String, table: String,
                       currentMonth: String): Seq[String] = {
    val log = wh.metadataLog(schema, table)
      .withColumn("month", date_format(timestamp_millis(col("last_updated_ms")), "yyyy-MM"))
    val rows = log.collect() // metadata-scale: one row per commit
    if (rows.isEmpty) return Seq.empty
    val current = wh.currentVersion(schema, table)
    val keep = rows.filter(r => r.getAs[String]("month") == currentMonth)
      .map(_.getAs[Long]("version")).toSet ++ Set(current, rows.map(_.getAs[Long]("version")).max)
    val doomed = rows.filter(r => !keep.contains(r.getAs[Long]("version")))
    val fsys = fsOf(spark, new Path(wh.tableDir(schema, table)))
    doomed.foreach(r => fsys.delete(new Path(r.getAs[String]("file")), false))
    doomed.map(_.getAs[String]("file")).sorted.toSeq
  }
}
