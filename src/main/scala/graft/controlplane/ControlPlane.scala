package graft.controlplane

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Relational

/** Control-plane domain layer — the reference's `etl_manager.py` query
  * surface re-expressed as typed DataFrame transforms. Each function cites
  * the reference lines it reproduces; all state lives in warehouse tables
  * (`etl_dates`, run registry, task-status log) so every transition is a
  * declarative read→transform→write.
  *
  * Tables are registry-scale (rows ≈ dates × sources × tasks), so every
  * join against them broadcasts; nothing here touches the data plane.
  */
object ControlPlane {

  // ---- ETL calendar (etl_manager.py:43-70,219-268,304-355) ----

  /** Next business date: min open non-holiday date, else max date — the
    * try/except ORDER BY LIMIT 1 pair collapsed to one aggregate (O1). */
  def nextEtlDate(etlDates: DataFrame): Option[String] =
    Relational.pickNextOrFallback(
      etlDates, col("holiday_flag") === 0 && col("status").isNull, "etl_date")
      .collect().headOption.flatMap(r => Option(r.getString(0)))

  /** Flip current_date_flag: 1 for the chosen date, 0 elsewhere
    * (etl_manager.py:319-337, two UPDATEs → one rewrite). */
  def setCurrentDate(etlDates: DataFrame, etlDate: String): DataFrame =
    etlDates.withColumn("current_date_flag",
      when(col("etl_date") === etlDate, 1).otherwise(0))

  /** Close the date: status='success' when every source's latest run
    * succeeded (the W1 latest-per-group dedup feeding an A3 bool-all,
    * etl_manager.py:219-268). */
  def closeEtlDate(etlDates: DataFrame, runs: DataFrame, etlDate: String): DataFrame = {
    val latest = Relational.latestPerGroup(
      runs.filter(col("etl_date") === etlDate), Seq("source_name"), "created_at", Seq("run_id"))
    // a date with ZERO runs must stay open — the empty-set-is-success parity
    // applies to task lists within a run, not to "did anything run at all"
    val head = latest.agg(
      Relational.boolAllExpr(col("status") === "success").as("ok"),
      count(lit(1)).as("n")).collect().head
    val allOk = head.getBoolean(0) && head.getLong(1) > 0
    if (allOk)
      etlDates.withColumn("status",
        when(col("etl_date") === etlDate, lit("success")).otherwise(col("status")))
    else etlDates
  }

  // ---- Run registry (etl_manager.py:72-102,271-301,358-382) ----

  /** New run row per (etl_date, source) with a fresh uuid. */
  def newRun(spark: SparkSession, etlDate: String, source: String,
             triggeredBy: String): DataFrame = {
    import spark.implicits._
    Seq((etlDate, source, triggeredBy)).toDF("etl_date", "source_name", "triggered_by")
      .withColumn("run_id", expr("uuid()"))
      .withColumn("created_at", current_timestamp())
      .withColumn("status", lit(null).cast("string"))
  }

  /** Latest run_id per (etl_date, source) — the correlated-MAX subquery
    * (J7, etl_manager.py:77-88) as a window argmax. */
  def latestRuns(runs: DataFrame): DataFrame =
    Relational.latestPerGroup(runs, Seq("etl_date", "source_name"), "created_at", Seq("run_id"))

  /** Roll task statuses up to run status: success iff every task row is
    * success/skipped; empty task list counts as success (Python all([])
    * parity, etl_manager.py:168-216; SURVEY §7.4.5). */
  def rollupRunStatus(tasks: DataFrame): DataFrame =
    tasks.groupBy(col("run_id"))
      .agg(when(Relational.boolAllExpr(col("status").isin("success", "skipped")),
        lit("success")).otherwise(lit("failed")).as("run_status"))

  /** Resume-skip gate: task ids with a prior success for (etl_date, source)
    * — check_conditions semantics (etl_manager.py:435-468) including the
    * TRY(split(task_id,'.')[3]) compound-OR match (P3). */
  def succeededTasks(tasks: DataFrame, etlDate: String, source: String): Set[String] =
    tasks.filter(col("etl_date") === etlDate && col("source_name") === source &&
      col("status") === "success")
      .select(coalesce(
        Relational.tryElementAt(col("task_id"), "\\.", 3), col("task_id")).as("t"))
      .distinct().collect().map(_.getString(0)).toSet

  // ---- Reporting (send_email.py:409-517 → one grouped pass) ----

  /** The per-source completion report: the reference loops ~5 queries × 20
    * sources; one groupBy computes every count (A2 mapping). */
  def completionReport(tasks: DataFrame): DataFrame =
    tasks.groupBy(col("source_name"), col("schema_name"))
      .agg(
        countDistinct(col("task_id")).as("n_total"),
        countDistinct(when(col("status") === "success", col("task_id"))).as("n_success"),
        (countDistinct(col("task_id")) -
          countDistinct(when(col("status") === "success", col("task_id")))).as("n_failure"))

  /** Render the report rows the reference emails (send_email.py:569-650
    * template replacement, F4) — one HTML table row per source plus a
    * totals row, entirely via format_string (no driver-side string loop). */
  def renderCompletionReport(report: DataFrame): DataFrame = {
    val rows = report.select(
      col("source_name"), col("schema_name"),
      format_string("<tr><td>%s</td><td>%s</td><td>%d</td><td>%d</td><td>%d</td></tr>",
        col("source_name"), col("schema_name"),
        col("n_total"), col("n_success"), col("n_failure")).as("html_row"))
    val totals = report.agg(
      sum(col("n_total")).as("t"), sum(col("n_success")).as("s"), sum(col("n_failure")).as("f"))
      .select(lit("_total").as("source_name"), lit("").as("schema_name"),
        format_string("<tr><td>TOTAL</td><td></td><td>%d</td><td>%d</td><td>%d</td></tr>",
          col("t"), col("s"), col("f")).as("html_row"))
    rows.unionByName(totals)
  }

  /** Drift-detail report (send_email.py:26-63): the schemadrift rows of one
    * run split into DELETED (status D) and ADDED (status I) sections,
    * rendered as HTML rows ordered by table, column. Output: (section,
    * table_name, column_name, html_row). */
  def renderDriftReport(drift: DataFrame, runId: String): DataFrame =
    drift.filter(col("run_id") === runId && col("status").isin("D", "I"))
      .select(
        when(col("status") === "D", lit("deleted")).otherwise(lit("added")).as("section"),
        col("table_name"), col("column_name"),
        format_string("<tr><td>%s</td><td>%s</td><td>%s</td><td>%s</td></tr>",
          col("table_name"), col("source_name"), col("column_name"),
          col("data_type")).as("html_row"))
      // deleted section first, as the reference email lays it out
      .orderBy(when(col("section") === "deleted", 0).otherwise(1),
        col("table_name"), col("column_name"))

  /** Error-summary report (send_email.py:654-667): one row per task not in
    * (success, skipped), per source. */
  def renderErrorSummary(tasks: DataFrame): DataFrame =
    tasks.filter(!col("status").isin("success", "skipped"))
      .select(col("source_name"), col("task_id"), col("status"),
        format_string("<tr><td>%s</td><td>%s</td><td>%s</td></tr>",
          col("source_name"), col("task_id"), col("status")).as("html_row"))
      .orderBy(col("source_name"), col("task_id"))

  /** Run-detail report (send_email.py:751-833): for each source's LATEST
    * run of `etlDate` (argmax created_at from the run log), the failed
    * tasks with start/end shifted to ICT (+7, F13) and the dag type
    * extracted from the '__'-split dag_id (F1/F2). Expects task rows
    * (run_id, source_name, dag_id, task_id, status, start_time, end_time)
    * and run-log rows (etl_date, source_name, run_id, created_at). */
  def renderRunDetail(tasks: DataFrame, runLog: DataFrame, etlDate: String): DataFrame = {
    val latest = Relational.argmax(
      runLog.filter(col("etl_date") === etlDate), Seq("source_name"), "created_at")
      .select(col("source_name"), col("run_id"))
    tasks.join(broadcast(latest), Seq("source_name", "run_id"))
      .filter(!col("status").isin("success", "skipped"))
      .select(
        col("source_name"),
        Relational.tryElementAt(col("dag_id"), "__", 3).as("dag_type"),
        col("task_id"),
        date_format(from_utc_timestamp(col("start_time"), "Asia/Bangkok"),
          "yyyy-MM-dd HH:mm:ss").as("start_ict"),
        date_format(from_utc_timestamp(col("end_time"), "Asia/Bangkok"),
          "yyyy-MM-dd HH:mm:ss").as("end_ict"))
      .withColumn("html_row",
        format_string("<tr><td>%s</td><td>%s</td><td>%s</td><td>%s</td><td>%s</td></tr>",
          col("source_name"), col("dag_type"), col("task_id"),
          col("start_ict"), col("end_ict")))
      .orderBy(col("source_name"), col("task_id"))
  }

  // ---- Record-count reconciliation (dag_etlpipeline__root.py:16,55-60) ----

  /** The root DAG's `check_records` task: per-source row-count
    * reconciliation between pipeline layers. The reference imports
    * `check_num_of_records` from `dags.utils.test_num_of_records` and runs
    * it with trigger_rule='all_done' right before `end`
    * (dag_etlpipeline__root.py:16,55-60); the util file itself is absent
    * from the repo, so the implied contract is implemented: staging must
    * hold exactly the rows the source delivered, and every staged business
    * key must have landed in its vault hub.
    *
    * Input: tagged layer frames `(source_name, layer, frame)` where layer ∈
    * {source, staging, vault_missing}; `vault_missing` is the anti-join of
    * staged business keys against the hub (expected empty). Output: one row
    * per source with the three counts and a match/mismatch status.
    *
    * Scale shape: each frame contributes only a constant-width tag row per
    * input row, the union aggregates with map-side partial counts, and the
    * single shuffle carries one row per (source, layer) — at 100 TB the
    * network cost is O(sources), not O(rows). No driver-side count() chain
    * (one Spark job total, not one per layer). */
  def reconcileCounts(layers: Seq[(String, String, DataFrame)]): DataFrame = {
    require(layers.nonEmpty, "reconcileCounts needs at least one layer frame")
    val tagged = layers.map { case (src, layer, df) =>
      df.select(lit(src).as("source_name"), lit(layer).as("layer"))
    }.reduce(_ unionByName _)
    tagged.groupBy(col("source_name"))
      .agg(
        count(when(col("layer") === "source", 1)).as("source_n"),
        count(when(col("layer") === "staging", 1)).as("staging_n"),
        count(when(col("layer") === "vault_missing", 1)).as("vault_missing_n"))
      .withColumn("status",
        when(col("source_n") === col("staging_n") &&
          col("vault_missing_n") === 0, lit("match")).otherwise(lit("mismatch")))
  }

  // ---- Registry lifecycle (etl_manager.py:779-866,983-1069,1120-1379) ----

  /** Rows of `incoming` not yet in `registry` → to insert with
    * active_status=1 (J2 left-anti new-pairs idiom). */
  def registerNew(incoming: DataFrame, registry: DataFrame, keys: Seq[String],
                  loadDate: Column): DataFrame =
    Relational.antiJoin(incoming, registry, keys)
      .withColumn("active_status", lit(1))
      .withColumn("retire_date", lit(null).cast("string"))
      .withColumn("load_date", loadDate)

  /** Registry rows whose source row disappeared → active_status=0 with
    * retire_date (J3 reverse-anti + J6 update). */
  def retireMissing(registry: DataFrame, incoming: DataFrame, keys: Seq[String],
                    retireDate: Column): DataFrame = {
    val gone = Relational.antiJoin(
      registry.filter(col("active_status") === 1).select(keys.map(col): _*),
      incoming, keys)
    Relational.updateWhereIn(registry, gone, keys,
      Map("active_status" -> lit(0), "retire_date" -> retireDate))
  }

  /** Retired rows that reappeared in the source → reactivate (J4 semi-join
    * + J6 update; change_type 'reused', etl_manager.py:1353-1376). */
  def reactivate(registry: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame = {
    val back = Relational.semiJoin(
      registry.filter(col("active_status") === 0).select(keys.map(col): _*),
      incoming, keys)
    Relational.updateWhereIn(registry, back, keys,
      Map("active_status" -> lit(1), "retire_date" -> lit(null).cast("string")))
  }

  /** Full sync cycle: register new, retire missing, reactivate returners —
    * returns (newRegistry, changeLog rows with change_type add/delete/reused). */
  def syncRegistry(registry: DataFrame, incoming: DataFrame, keys: Seq[String],
                   loadDate: Column): (DataFrame, DataFrame) = {
    val fresh = registerNew(incoming, registry, keys, loadDate)
    val keyCols = keys.map(col)
    val adds = fresh.select(keyCols: _*).withColumn("change_type", lit("add"))
    val goneKeys = Relational.antiJoin(
      registry.filter(col("active_status") === 1).select(keyCols: _*), incoming, keys)
      .withColumn("change_type", lit("delete"))
    val backKeys = Relational.semiJoin(
      registry.filter(col("active_status") === 0).select(keyCols: _*), incoming, keys)
      .withColumn("change_type", lit("reused"))
    val updated = reactivate(retireMissing(registry, incoming, keys, loadDate), incoming, keys)
    val merged = updated.unionByName(fresh.select(updated.columns.map(col): _*))
    (merged, adds.unionByName(goneKeys).unionByName(backKeys))
  }
}
