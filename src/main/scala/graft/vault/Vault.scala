package graft.vault

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data Vault 2.0 builders — the native replacement for the reference's dbt
  * staging/raw-vault models (implied by column conventions at
  * /root/reference/utlis/etl_manager.py:894,1231 and the entity taxonomy at
  * :661-681): hubs, links, and SCD2 satellites keyed by md5 hash keys with
  * `load_date` / `record_source` / `load_end_date` metadata columns.
  *
  * Scale notes (the 100 TB contract):
  *   - hash keys are md5 over concat_ws of business keys — uniformly
  *     distributed, so every downstream groupBy/join on them partitions
  *     evenly (no skew, no salting needed).
  *   - hub/link builds are one distinct-aggregate (map-side partial) on the
  *     hash key; satellite builds are one shuffle on the hash key feeding
  *     both window passes (change-compression and close-off reuse the same
  *     partitioning — Catalyst plans a single Exchange).
  *   - builders never collect; everything composes as DataFrames.
  */
object Vault {

  /** Data Vault hash key: md5 of '||'-joined business key columns, cast to
    * string — matches Trino to_hex(md5(to_utf8(...)))'s hex-string shape
    * (reference backup_nessie_postgres.py:88).
    *
    * NULL columns serialize as a NUL (U+0000) sentinel (concat_ws silently SKIPS
    * nulls, which would make (NULL,'x') and ('x',NULL) collide — standard
    * DV hashing keeps null, empty, and absent distinguishable). DuckDB
    * mirror: md5(coalesce(CAST(c AS VARCHAR), chr(0)) || '||' || ...). */
  def hashKey(cols: Seq[Column]): Column =
    md5(concat_ws("||",
      cols.map(c => coalesce(c.cast("string"), lit("\u0000"))): _*))

  /** Hash-diff over attribute columns for satellite change detection. */
  def hashDiff(cols: Seq[Column]): Column = hashKey(cols)

  /** Hub: one row per distinct business key.
    * Output: {name}_hash_key, business keys, load_date, record_source. */
  def hub(src: DataFrame, name: String, businessKeys: Seq[String],
          loadDate: Column, recordSource: String): DataFrame =
    src.select(businessKeys.map(col): _*).distinct()
      .select(
        hashKey(businessKeys.map(col)).as(s"hub_${name}_hash_key") +:
          businessKeys.map(col) :+
          loadDate.as("load_date") :+
          lit(recordSource).as("record_source"): _*)

  /** Link: one row per distinct combination of parent hub keys.
    * keyMap = (hubName -> its business key columns in src). */
  def link(src: DataFrame, name: String, keyMap: Seq[(String, Seq[String])],
           loadDate: Column, recordSource: String): DataFrame = {
    val allKeys = keyMap.flatMap(_._2)
    val hubKeyCols = keyMap.map { case (hubName, keys) =>
      hashKey(keys.map(col)).as(s"hub_${hubName}_hash_key")
    }
    src.select(allKeys.distinct.map(col): _*).distinct()
      .select(
        hashKey(allKeys.map(col)).as(s"link_${name}_hash_key") +:
          hubKeyCols :+
          loadDate.as("load_date") :+
          lit(recordSource).as("record_source"): _*)
  }

  /** Point-in-time reconstruction over an SCD2 satellite: the version
    * current AT `asOf` per hash key — load_date ≤ asOf < load_end_date
    * (open versions have NULL end). Row-level time travel as a pure
    * filter: the close-off did the work at build time, so reconstructing
    * any historical state costs one scan — no window, no join, no
    * version-log walk (complements Warehouse.readAt's version-level
    * travel). */
  def snapshotAt(sat: DataFrame, asOf: Column): DataFrame =
    sat.filter(col("load_date") <= asOf &&
      (col("load_end_date").isNull || col("load_end_date") > asOf))

  /** SCD2 satellite: per hub key ordered by load date, keep only rows whose
    * hash_diff changed vs the previous row (change compression), then
    * close each version with load_end_date = next load_date (null = open).
    * The reference's implied satellite contract (etl_manager.py:1231) made
    * explicit; tie-break columns make versioning deterministic under
    * same-day loads. */
  def satellite(src: DataFrame, name: String, businessKeys: Seq[String],
                attrs: Seq[String], loadCol: String,
                tieBreak: Seq[String] = Nil): DataFrame = {
    val hk = s"sat_${name}_hash_key"
    val ordering = (col(loadCol) +: tieBreak.map(col)).map(_.asc)
    val wOrd = Window.partitionBy(col(hk)).orderBy(ordering: _*)
    val staged = src.select(
      hashKey(businessKeys.map(col)).as(hk) +:
        col(loadCol).as("load_date") +:
        tieBreak.map(col) :+
        hashDiff(attrs.map(col)).as("hash_diff") :+
        struct(attrs.map(col): _*).as("__attrs"): _*)
    val changed = staged
      .withColumn("__prev", lag(col("hash_diff"), 1).over(wOrd))
      .filter(col("__prev").isNull || col("__prev") =!= col("hash_diff"))
      .drop("__prev")
    val wClose = Window.partitionBy(col(hk))
      .orderBy((col("load_date") +: tieBreak.map(col)).map(_.asc): _*)
    changed
      .withColumn("load_end_date", lead(col("load_date"), 1).over(wClose))
      .select(col(hk) +: col("load_date") +: col("load_end_date") +:
        col("hash_diff") +: attrs.map(a => col(s"__attrs.$a").as(a)): _*)
  }
}
