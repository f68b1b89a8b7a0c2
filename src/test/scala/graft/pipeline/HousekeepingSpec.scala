package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.controlplane.ControlPlane
import graft.core.Warehouse

class HousekeepingSpec extends SparkSpec {
  import spark.implicits._

  private def whWithTables(): Warehouse = {
    val wh = new Warehouse(spark, Files.createTempDirectory("graft_hk_").toString)
    (1 to 3).foreach(i => wh.append("s", "a", Seq((i, s"v$i")).toDF("id", "v")))
    wh.overwrite("s", "b", Seq((1, "x")).toDF("id", "v"))
    wh
  }

  test("compaction workflow compacts every table; statuses roll up") {
    val wh = whWithTables()
    val r = Housekeeping.runCompaction(spark, wh)
    r.assertAllSuccess()
    assert(r.runs.map(_.taskId).count(_.startsWith("compact_")) === 2)
    assert(wh.dataDirs("s", "a").size === 1) // 3 append dirs → 1
  }

  test("metadata prune gate: skips all work when compaction didn't run this month") {
    val wh = whWithTables()
    val skipped = Housekeeping.runMetadataPrune(spark, wh, "1970-01",
      compactionRanThisMonth = false)
    skipped.assertAllSuccess() // skipped counts as ok
    assert(skipped.status("start") === "skipped")
    assert(skipped.runs.filter(_.taskId.startsWith("prune_")).forall(_.status == "skipped"))
    assert(skipped.status("end") === "success") // all_done end ran
    val ran = Housekeeping.runMetadataPrune(spark, wh, "1970-01",
      compactionRanThisMonth = true)
    ran.assertAllSuccess()
    assert(ran.runs.filter(_.taskId.startsWith("prune_")).forall(_.status == "success"))
  }

  test("underscore-ambiguous table names abort instead of silently dropping one") {
    val wh = new Warehouse(spark, Files.createTempDirectory("graft_hk_").toString)
    // ("a","b_c") and ("a_b","c") both flatten to task id "compact_a_b_c"
    wh.overwrite("a", "b_c", Seq((1, "x")).toDF("id", "v"))
    wh.overwrite("a_b", "c", Seq((1, "y")).toDF("id", "v"))
    val e = intercept[IllegalArgumentException](Housekeeping.runCompaction(spark, wh))
    assert(e.getMessage.contains("collide"))
  }

  test("duplicate mart specs abort instead of duplicating workflow task ids") {
    val wh = whWithTables()
    val m = Housekeeping.MartSpec("s", "a", Seq("id"), 4)
    val e = intercept[IllegalArgumentException](
      Housekeeping.runMartRefresh(wh, Seq(m, m)))
    assert(e.getMessage.contains("collide"))
  }

  test("orphan sweep workflow removes stale dirs after compaction") {
    val wh = whWithTables()
    Housekeeping.runCompaction(spark, wh)
    // drop old logs so v1-3 dirs of table a become orphans, then sweep now
    graft.maintenance.Maintenance.pruneMetadataLog(spark, wh, "s", "a", "1970-01")
    val r = Housekeeping.runOrphanSweep(spark, wh, retainMs = 0L)
    r.assertAllSuccess()
    assert(wh.dataDirs("s", "a").size === 1)
    assert(wh.read("s", "a").count() === 3)
  }

  test("completion report renders per-source and total rows") {
    val tasks = Seq(
      ("src_a", "staging", "t1", "success"), ("src_a", "staging", "t2", "failed"),
      ("src_b", "vault", "t1", "success")
    ).toDF("source_name", "schema_name", "task_id", "status")
    val html = ControlPlane.renderCompletionReport(ControlPlane.completionReport(tasks))
      .orderBy("source_name")
    val rows = html.select("html_row").as[String].collect()
    assert(rows.length === 3)
    assert(rows.exists(_.contains("<td>src_a</td>")))
    assert(rows.exists(_.contains("<td>TOTAL</td>")))
  }

  test("mart refresh publishes a bucketed mart per spec and rolls up") {
    val wh = whWithTables()
    // drop catalog entries AND stale directories — a previous JVM's run
    // leaves managed-table dirs the fresh in-memory catalog doesn't know,
    // and saveAsTable refuses to create over an existing location
    val whDir = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), "graft_mart.db")
    Seq("s_a", "s_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS graft_mart.$t")
      val d = new java.io.File(whDir, t)
      if (d.exists()) org.apache.commons.io.FileUtils.deleteDirectory(d)
    }
    val r = Housekeeping.runMartRefresh(wh, Seq(
      Housekeeping.MartSpec("s", "a", Seq("id"), 4),
      Housekeeping.MartSpec("s", "b", Seq("id"), 4)))
    r.assertAllSuccess()
    assert(spark.table("graft_mart.s_a").count() === 3)
    assert(spark.table("graft_mart.s_b").count() === 1)
    // the published mart is genuinely bucketed (catalog metadata, not luck)
    val desc = spark.sql("DESCRIBE EXTENDED graft_mart.s_a").collect()
      .map(_.mkString("|")).mkString("\n")
    assert(desc.contains("Num Buckets") && desc.contains("4"), desc)
  }
}
