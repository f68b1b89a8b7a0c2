package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.core.Warehouse

/** Incremental vault: two AvailableNow runs over a growing directory merge
  * exactly the delta (checkpoint), idempotently, into hub + satellite. */
class IncrementalVaultSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("ck", StringType), StructField("load_date", StringType),
    StructField("status", StringType)))

  test("AvailableNow ingest merges only new files; close-off versions history") {
    val srcDir = Files.createTempDirectory("graft_iv_src_").toString
    val ckpt = Files.createTempDirectory("graft_iv_ck_").toString
    val wh = new Warehouse(spark, Files.createTempDirectory("graft_iv_wh_").toString)

    Seq(("k1", "2024-01-01", "A"), ("k2", "2024-01-01", "X"))
      .toDF("ck", "load_date", "status")
      .coalesce(1).write.parquet(s"$srcDir/batch1.parquet")
    IncrementalVault.ingest(spark, wh, srcDir, schema, "cust",
      Seq("ck"), Seq("status"), "load_date", ckpt)
    assert(wh.read("raw_vault", "hub_cust").count() === 2)
    assert(wh.read("raw_vault", "sat_cust_history").count() === 2)

    // second batch: one new key, one changed key, one unchanged duplicate
    Seq(("k3", "2024-01-02", "N"), ("k1", "2024-01-02", "B"), ("k2", "2024-01-02", "X"))
      .toDF("ck", "load_date", "status")
      .coalesce(1).write.parquet(s"$srcDir/batch2.parquet")
    IncrementalVault.ingest(spark, wh, srcDir, schema, "cust",
      Seq("ck"), Seq("status"), "load_date", ckpt)

    val hub = wh.read("raw_vault", "hub_cust")
    assert(hub.count() === 3)
    // k1's hub load_date stays the FIRST sighting
    assert(hub.filter(col("ck") === "k1").select("load_date").as[String].head() === "2024-01-01")

    IncrementalVault.closeOff(spark, wh, "cust")
    val sat = wh.read("raw_vault", "sat_cust")
    // k1: A then B — A's window closes at B's load date, B stays open
    assert(sat.filter(col("status") === "A").select("load_end_date").as[String].head()
      === "2024-01-02")
    assert(sat.filter(col("status") === "B").select("load_end_date").as[String].head() === null)
    // cross-batch compression: k2's unchanged X arriving again in batch2
    // must NOT open a second version
    assert(sat.filter(col("status") === "X").count() === 1)

    // third run with no new files: nothing changes (checkpoint)
    val hubV = wh.currentVersion("raw_vault", "hub_cust")
    IncrementalVault.ingest(spark, wh, srcDir, schema, "cust",
      Seq("ck"), Seq("status"), "load_date", ckpt)
    assert(wh.currentVersion("raw_vault", "hub_cust") === hubV)
  }
}
