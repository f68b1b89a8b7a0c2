package graft.controlplane

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Control-plane transition semantics: calendar picking/closing, run
  * rollups with empty-set parity, resume gates, and the registry
  * add/delete/reused lifecycle. */
class ControlPlaneSpec extends SparkSpec {
  import spark.implicits._

  private def calendar = Seq(
    ("2024-01-01", 0, "success"),
    ("2024-01-02", 1, null), // holiday — never picked
    ("2024-01-03", 0, null),
    ("2024-01-04", 0, null)
  ).toDF("etl_date", "holiday_flag", "status")

  test("nextEtlDate picks min open date; falls back to max when none open") {
    assert(ControlPlane.nextEtlDate(calendar).contains("2024-01-03"))
    val closed = calendar.withColumn("status", lit("success"))
    assert(ControlPlane.nextEtlDate(closed).contains("2024-01-04"))
  }

  test("setCurrentDate flips exactly one flag") {
    val out = ControlPlane.setCurrentDate(calendar, "2024-01-03")
    assert(out.filter(col("current_date_flag") === 1)
      .select("etl_date").as[String].collect().toSeq === Seq("2024-01-03"))
  }

  test("closeEtlDate closes only when every source's LATEST run succeeded") {
    val runs = Seq(
      ("2024-01-03", "src_a", "r1", 1L, "failed"),
      ("2024-01-03", "src_a", "r2", 2L, "success"), // retry succeeded
      ("2024-01-03", "src_b", "r3", 1L, "success")
    ).toDF("etl_date", "source_name", "run_id", "created_at", "status")
    val closed = ControlPlane.closeEtlDate(calendar, runs, "2024-01-03")
    assert(closed.filter(col("etl_date") === "2024-01-03")
      .select("status").as[String].head() === "success")
    // latest run failed → stays open
    val runsBad = runs.withColumn("status",
      when(col("run_id") === "r2", "failed").otherwise(col("status")))
    val open = ControlPlane.closeEtlDate(calendar, runsBad, "2024-01-03")
    assert(open.filter(col("etl_date") === "2024-01-03")
      .select("status").as[String].head() === null)
  }

  test("closeEtlDate keeps a date with ZERO runs open") {
    val noRuns = Seq.empty[(String, String, String, Long, String)]
      .toDF("etl_date", "source_name", "run_id", "created_at", "status")
    val out = ControlPlane.closeEtlDate(calendar, noRuns, "2024-01-03")
    assert(out.filter(col("etl_date") === "2024-01-03")
      .select("status").as[String].head() === null)
  }

  test("rollupRunStatus: all success/skipped → success; empty set → success (all([]) parity)") {
    val tasks = Seq(
      ("r1", "t1", "success"), ("r1", "t2", "skipped"),
      ("r2", "t1", "success"), ("r2", "t2", "failed")
    ).toDF("run_id", "task_id", "status")
    val roll = ControlPlane.rollupRunStatus(tasks).as[(String, String)].collect().toMap
    assert(roll("r1") === "success")
    assert(roll("r2") === "failed")
  }

  test("succeededTasks matches both bare and dag.group.task ids (P3 compound OR)") {
    val tasks = Seq(
      ("2024-01-03", "s", "staging.src.load_customers", "success"),
      ("2024-01-03", "s", "load_orders", "success"),
      ("2024-01-03", "s", "load_parts", "failed")
    ).toDF("etl_date", "source_name", "task_id", "status")
    val done = ControlPlane.succeededTasks(tasks, "2024-01-03", "s")
    assert(done === Set("load_customers", "load_orders"))
  }

  test("completionReport computes totals/success/failure in one pass") {
    val tasks = Seq(
      ("src_a", "staging", "t1", "success"),
      ("src_a", "staging", "t2", "failed"),
      ("src_a", "staging", "t2", "failed"), // duplicate row — countDistinct
      ("src_b", "vault", "t1", "success")
    ).toDF("source_name", "schema_name", "task_id", "status")
    val rep = ControlPlane.completionReport(tasks)
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(rep(("src_a", "staging")) === ((2L, 1L, 1L)))
    assert(rep(("src_b", "vault")) === ((1L, 1L, 0L)))
  }

  private def registry = Seq(
    ("m1", 1, null.asInstanceOf[String], "2024-01-01"),
    ("m2", 1, null.asInstanceOf[String], "2024-01-01"),
    ("m3", 0, "2024-01-02", "2024-01-01") // previously retired
  ).toDF("model", "active_status", "retire_date", "load_date")

  test("drift report splits deleted/added sections for one run") {
    val drift = Seq(
      ("r1", "t1", "s1", "gone_col", "varchar", "D"),
      ("r1", "t1", "s1", "new_col", "bigint", "I"),
      ("r1", "t2", "s1", "id", "varchar", "I"),
      ("r2", "t1", "s1", "other_run", "varchar", "D"))
      .toDF("run_id", "table_name", "source_name", "column_name", "data_type", "status")
    val out = ControlPlane.renderDriftReport(drift, "r1").collect()
    assert(out.length === 3)
    // deleted section renders first (reference email layout)
    assert(out.map(_.getString(0)).toSeq === Seq("deleted", "added", "added"))
    assert(out.exists(_.getAs[String]("html_row").contains("<td>new_col</td>")))
  }

  test("error summary lists only non-success, non-skipped tasks") {
    val tasks = Seq(
      ("s1", "stage", "success"), ("s1", "vault", "failed"),
      ("s2", "stage", "skipped"), ("s2", "vault", "upstream_failed"))
      .toDF("source_name", "task_id", "status")
    val out = ControlPlane.renderErrorSummary(tasks).collect()
    assert(out.map(r => (r.getString(0), r.getString(2))).toSeq ===
      Seq(("s1", "failed"), ("s2", "upstream_failed")))
  }

  test("run detail: latest run per source, failed tasks, ICT shift, dag type") {
    val runLog = Seq(
      ("2024-01-01", "s1", "old_run", 1L), ("2024-01-01", "s1", "new_run", 2L))
      .toDF("etl_date", "source_name", "run_id", "created_at")
    val ts = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val tasks = Seq(
      ("new_run", "s1", "10_01__s1__staging", "load", "failed", ts, ts),
      ("new_run", "s1", "10_01__s1__staging", "typed", "success", ts, ts),
      ("old_run", "s1", "10_01__s1__staging", "stale", "failed", ts, ts))
      .toDF("run_id", "source_name", "dag_id", "task_id", "status",
        "start_time", "end_time")
    val out = ControlPlane.renderRunDetail(tasks, runLog, "2024-01-01").collect()
    assert(out.length === 1) // only the latest run's failed task
    val r = out.head
    assert(r.getAs[String]("task_id") === "load")
    assert(r.getAs[String]("dag_type") === "staging")
    assert(r.getAs[String]("start_ict") === "2024-01-01 17:00:00") // +7h
  }

  test("syncRegistry: add new, retire missing, reactivate returning") {
    val incoming = Seq("m1", "m3", "m4").toDF("model")
    val (merged, changes) = ControlPlane.syncRegistry(
      registry, incoming, Seq("model"), lit("2024-01-05"))
    val byModel = merged.select("model", "active_status", "retire_date")
      .as[(String, Int, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byModel("m1") === ((1, null)))       // unchanged
    assert(byModel("m2") === ((0, "2024-01-05"))) // retired
    assert(byModel("m3") === ((1, null)))       // reactivated
    assert(byModel("m4") === ((1, null)))       // added
    val ch = changes.as[(String, String)].collect().toSet
    assert(ch === Set(("m4", "add"), ("m2", "delete"), ("m3", "reused")))
  }

  test("reconcileCounts: per-source layer counts with both mismatch modes") {
    val src = Seq(1, 2, 3, 4).toDF("k")
    val stgShort = Seq(1, 2, 3).toDF("k")          // short staging
    val missing = Seq(9).toDF("k")                 // a key absent from hub
    val empty = Seq.empty[Int].toDF("k")
    val out = ControlPlane.reconcileCounts(Seq(
      ("a", "source", src), ("a", "staging", stgShort), ("a", "vault_missing", empty),
      ("b", "source", src), ("b", "staging", src), ("b", "vault_missing", missing),
      ("c", "source", src), ("c", "staging", src), ("c", "vault_missing", empty)))
      .orderBy("source_name")
      .as[(String, Long, Long, Long, String)].collect()
    assert(out === Array(
      ("a", 4L, 3L, 0L, "mismatch"),   // staging short
      ("b", 4L, 4L, 1L, "mismatch"),   // hub incomplete
      ("c", 4L, 4L, 0L, "match")))
  }

  test("syncRegistry is idempotent on a second identical sync") {
    val incoming = Seq("m1", "m3", "m4").toDF("model")
    val (merged, _) = ControlPlane.syncRegistry(
      registry, incoming, Seq("model"), lit("2024-01-05"))
    val (again, changes2) = ControlPlane.syncRegistry(
      merged, incoming, Seq("model"), lit("2024-01-06"))
    assert(again.exceptAll(merged).isEmpty && merged.exceptAll(again).isEmpty)
    assert(changes2.isEmpty)
  }
}
